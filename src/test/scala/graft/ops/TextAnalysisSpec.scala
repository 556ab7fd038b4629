package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tokenCount and substrCount") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("the fast the slow thethe", "one two").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.substrCount(col("text"), "the").as("c")).collect()
    assert(got(0).getInt(0) == 5 && got(0).getLong(1) == 4)
    assert(got(1).getInt(0) == 2 && got(1).getLong(1) == 0)
  }

  test("quality metrics are exact") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("abc de fgh").toDF("text") // 10 chars, 3 tokens, 8 non-sep
    val cols = TextAnalysis.qualityCols(col("text")).map { case (n, c) => c.as(n) }
    val r = df.select(cols: _*).head
    assert(r.getAs[Long]("n_chars") == 10L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Double]("mean_tok_len") == 8.0 / 3.0)
  }

  test("repetitionStats: closed-form checks incl. one- and two-token docs") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),   // 6 toks, 2 distinct; top bigram "a b"×3 or "b a"×2
      (2L, "x"),             // no bigrams/trigrams → 0.0 fractions
      (3L, "x y"),           // one bigram, no trigrams
      (4L, "p q r p q r p q r")) // trigram "p q r"×3 + rotations ×2 each
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    // doc 1: len=11; dup_token = (6-2)/6; "a b"(len 3)×3 beats "b a"×2 →
    // 9/11; trigrams "a b a"×2 + "b a b"×2 → (2+2)*5/11
    assert(r(1) == ((6, 4.0 / 6.0, 9.0 / 11.0, 20.0 / 11.0)))
    assert(r(2) == ((1, 0.0, 0.0, 0.0)))
    // doc 3: unique bigram "x y" count 1 → (1*3)/3 = 1.0; no dup trigrams
    assert(r(3) == ((2, 0.0, 1.0, 0.0)))
    // doc 4: len=17; bigrams: "p q"×3,"q r"×3,"r p"×2 → tie 3 → lexicographically
    // larger of ("p q","q r") = "q r", frac 9/17; trigrams "p q r"×3,
    // "q r p"×2, "r p q"×2 all dup → (3+2+2)*5/17
    assert(r(4) == ((9, (9 - 3) / 9.0, 9.0 / 17.0, 35.0 / 17.0)))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(3L, 2L, 1L))).toDF("a", "b")
    val r = df.select(TextAnalysis.fingerprint(col("a")).as("fa"),
      TextAnalysis.fingerprint(col("b")).as("fb")).head
    val M = TextAnalysis.FingerprintMod
    val expectA = Seq(1L, 2L, 3L).foldLeft(1125899906842597L % M)((acc, v) => (acc * 31L + v) % M)
    assert(r.getLong(0) == expectA)
    assert(r.getLong(0) != r.getLong(1))
  }
}
