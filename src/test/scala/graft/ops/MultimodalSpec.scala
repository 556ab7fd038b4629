package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.syntheticMedia(spark, 200, parts = 8)

  test("decode stage recovers the typed metadata struct from binary payloads") {
    val d = Multimodal.decodeMeta(media)
    assert(d.count() == 200)
    val r = d.where(col("media_id") === 9).select("meta.width", "meta.height", "meta.frames").head
    assert(r.getInt(0) == 64 + (9 % 8) * 16)
    assert(r.getInt(1) == 48 + (9 % 5) * 16)
    assert(r.getInt(2) == 1 + (9 % 4))
  }

  test("resize keeps aspect and clamps to the target box") {
    val d = Multimodal.resizeMeta(Multimodal.decodeMeta(media), maxSide = 64)
    val bad = d.where(col("out_width") > 64 || col("out_height") > 64 ||
      col("out_width") <= 0 || col("out_height") <= 0)
    assert(bad.isEmpty)
    // a 64-wide image stays 64
    assert(d.where(col("meta.width") === 64 && col("meta.height") <= 64)
      .select("out_width").head.getInt(0) == 64)
  }

  test("frame sampling explodes every k-th frame, images yield frame 0") {
    val d = Multimodal.sampleFrames(Multimodal.decodeMeta(media), everyK = 2)
    val perId = d.groupBy("media_id").count()
      .join(Multimodal.decodeMeta(media).select("media_id", "meta.frames"), "media_id")
      .collect()
    perId.foreach { r =>
      val expect = (r.getInt(2) + 1) / 2 // frames 1..4 sampled every 2
      assert(r.getLong(1) == expect, s"media ${r.getLong(0)}")
    }
  }

  test("real PNG modality: decode, resample, channel stats via the JDK codec") {
    val png = Multimodal.syntheticMediaPng(spark, 60, parts = 4)
    val d = Multimodal.decodeMetaReal(png)
    assert(d.count() == 60)
    // image dims come from the actual PNG header, not a fake layout
    val r = d.where(col("media_id") === 1).select("meta.width", "meta.height").head
    assert(r.getInt(0) == 16 + 1 * 4 && r.getInt(1) == 12 + 1 * 4)
    // real resample: payload re-encoded, decoded dims shrink into the box
    val resized = Multimodal.decodeMetaReal(
      Multimodal.resizePayload(png, maxSide = 10))
    val badRows = resized.where(col("kind") === "image" &&
      (col("meta.width") > 10 || col("meta.height") > 10))
    assert(badRows.isEmpty)
    // channel means: synthetic pixel v has r=v, g=3v%256, b=5v%256 → means
    // bounded in [0,255] and non-null for every image
    val stats = Multimodal.channelStats(png).where(col("kind") === "image")
      .select("rgb_mean").collect()
    assert(stats.nonEmpty && stats.forall { row =>
      val m = row.getSeq[Double](0)
      m.length == 3 && m.forall(v => v >= 0 && v <= 255)
    })
    // videos keep the documented fake-codec path
    assert(d.where(col("kind") === "video" && col("meta.frames") >= 1).count() ==
      d.where(col("kind") === "video").count())
  }

  test("fingerprint is deterministic across partitionings") {
    val a = Multimodal.fingerprint(media.repartition(2))
      .select("media_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Multimodal.fingerprint(media.repartition(13))
      .select("media_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.size == 200)
  }
}
