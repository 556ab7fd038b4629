package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  /** corpus with planted near-duplicates: doc 2i+1 is doc 2i with one token
    * changed; unrelated docs share almost nothing. */
  lazy val docs = {
    val spark2 = spark
    import spark2.implicits._
    // disjoint vocab per doc-pair: unrelated docs share zero tokens
    val vocabPool = (0 until 3200).map(i => s"w$i")
    (0 until 40).flatMap { i =>
      val base = (0 until 80).map(j => vocabPool(i * 80 + j))
      Seq((2L * i, base.mkString(" ")),
        (2L * i + 1, (base.dropRight(1) :+ "CHANGED").mkString(" ")))
    }.toDF("doc_id", "text")
  }

  test("vocab assigns dense lexicographic ids deterministically") {
    val v = Dedup.vocab(docs, "text").collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = v.sortBy(_._2)
    assert(sorted.map(_._1).toSeq == sorted.map(_._1).sorted.toSeq)
    assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
  }

  test("minhash matches brute-force formula") {
    val voc = Dedup.vocab(docs, "text")
    val tv = Dedup.docTokenVids(docs, "doc_id", "text", voc)
    val got = Dedup.minhash(tv, 4).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val vocMap = voc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docMap = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- docMap; j <- 0 until 4) {
      val vids = text.split(" ").distinct.map(vocMap)
      val expect = vids.map(v => ((v + 1) * (2654435761L + 2L * j) + j * 7919L) % Dedup.MersennePrime).min
      assert(got((id, j)) == expect, s"doc $id hash $j")
    }
  }

  test("lshCandidates finds planted near-dup pairs and no unrelated ones") {
    val voc = Dedup.vocab(docs, "text")
    val tv = Dedup.docTokenVids(docs, "doc_id", "text", voc)
    val cands = Dedup.lshCandidates(Dedup.minhash(tv, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 40).map(i => (2L * i, 2L * i + 1)).toSet
    // near-dups share 29/31 distinct tokens → most bands collide
    val found = planted.intersect(cands)
    assert(found.size >= 35, s"recall too low: ${found.size}/40")
    // unrelated pairs share ≤ a few tokens; allow rare accidental collisions
    assert((cands -- planted).size <= 3, s"false positives: ${cands -- planted}")
  }

  test("ngramJaccard matches brute force") {
    val got = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 1000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val docMap = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    for (a <- docMap.keys; b <- docMap.keys if a < b) {
      val (ga, gb) = (grams(docMap(a)), grams(docMap(b)))
      val inter = ga.intersect(gb).size
      if (inter == 0) assert(!got.contains((a, b)))
      else {
        val (gi, gj) = got((a, b))
        assert(gi == inter.toLong)
        assert(gj == inter.toDouble / (ga.size + gb.size - inter))
      }
    }
  }

  test("simhash: near-dups are hamming-close, unrelated docs are far") {
    val voc = Dedup.vocab(docs, "text")
    val tv = Dedup.docTokenVids(docs, "doc_id", "text", voc)
    val sh = Dedup.simhash(tv).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearAvg = (0 until 40).map(i => ham(sh(2L * i), sh(2L * i + 1))).sum / 40.0
    val farAvg = (0 until 39).map(i => ham(sh(2L * i), sh(2L * i + 2))).sum / 39.0
    // one changed token in 81 flips only boundary bits; unrelated ≈ random
    assert(farAvg > 20, s"unrelated docs should be ~random: $farAvg")
    assert(nearAvg < farAvg / 2, s"no separation: near=$nearAvg far=$farAvg")
  }

  test("exact dedup keeps min id per key with counts") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((5L, "a"), (3L, "a"), (7L, "b")).toDF("doc_id", "key")
    val got = Dedup.exact(df, "doc_id", "key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 3L, 2L), ("b", 7L, 1L)))
  }
}
