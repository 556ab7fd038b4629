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
