package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: code range, reconstruction distortion bound,
  * and quantized-search recall vs the exact baseline. */
class QuantizeSpec extends SparkSpec {

  private lazy val emb = {
    val spark2 = spark
    import spark2.implicits._
    (0 until 200).map { i =>
      val c = i % 10
      val v = Array.tabulate(16) { d =>
        val base = math.sin(c * 16 + d + 1).toFloat
        val pert = (((i * 16 + d) * 2654435761L % 1000L) / 10000.0f) - 0.05f
        base + pert
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("codes stay in [-127, 127]; reconstruction error <= scale/2") {
    val rows = emb.select(col("vec_id"), col("embedding"),
        Quantize.sq8Scale(col("embedding")).as("s"),
        Quantize.sq8Codes(col("embedding")).as("c"),
        Quantize.sq8Reconstruct(col("embedding")).as("r"))
      .collect()
    rows.length shouldBe 200
    rows.foreach { r =>
      val s = r.getDouble(2)
      val codes = r.getSeq[Long](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      val v = r.getSeq[Float](1)
      val rec = r.getSeq[Double](4)
      v.zip(rec).foreach { case (x, y) =>
        assert(math.abs(x.toDouble - y) <= s / 2 + 1e-12)
      }
    }
  }

  test("quantized top-3 has high recall against exact cosine") {
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = Quantize.annSq8(emb, "vec_id", "embedding", 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = exact.toSeq.map { case (q, ids) =>
      got.get(q).map(g => ids.count(g.contains).toDouble / ids.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"mean quantized recall@3 = $recall")
  }
}
