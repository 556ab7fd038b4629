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

  test("real WAV modality: round trip, chunk walk, downsample, rms/peak stats") {
    import Multimodal.Wav
    // stereo square wave at ±8192 (L) and a ramp (R), 8 kHz, 800 frames
    val frames = 800
    val samples = new Array[Short](frames * 2)
    for (f <- 0 until frames) {
      samples(f * 2) = (if ((f / 4) % 2 == 0) 8192 else -8192).toShort
      samples(f * 2 + 1) = ((f % 64) * 512 - 16384).toShort
    }
    val wav = Wav.encode(8000, 2, samples)
    val (rate, ch, back) = Wav.decode(wav)
    assert(rate == 8000 && ch == 2 && back.toSeq == samples.toSeq)

    // an extra LIST chunk before data must be skipped by the chunk walk
    val extra = java.nio.ByteBuffer.allocate(wav.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 36) // RIFF..fmt chunk
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    extra.put(wav, 36, wav.length - 36)
    extra.putInt(4, 36 + 12 + (wav.length - 44)) // fix RIFF size
    val (r2, c2, b2) = Wav.decode(extra.array())
    assert(r2 == 8000 && c2 == 2 && b2.toSeq == samples.toSeq)

    // square wave: rms == peak == 8192/32768 exactly
    val (dur, rms, peak) = Wav.stats(wav)
    assert(dur == frames / 8000.0)
    assert(math.abs(rms(0) - 0.25) < 1e-12 && peak(0) == 0.25)
    assert(peak(1) > rms(1) && rms(1) > 0) // ramp channel sanity

    // downsample: half the frames, half the declared rate, same duration
    val down = Wav.downsample(wav, 2)
    val (r3, c3, s3) = Wav.decode(down)
    assert(r3 == 4000 && c3 == 2 && s3.length == frames / 2 * 2)
    assert(Wav.stats(down)._1 == dur)

    // distributed audioStats over the media frame shape
    val spark2 = spark
    import spark2.implicits._
    val media = Seq((1L, "audio", wav), (2L, "image", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    val stats = Multimodal.audioStats(media).collect().sortBy(_.getLong(0))
    assert(stats(0).getDouble(3) == dur && stats(0).getSeq[Double](4).head == rms(0))
    assert(stats(1).isNullAt(3))
  }

  test("fingerprint is deterministic across partitionings") {
    val a = Multimodal.fingerprint(media.repartition(2))
      .select("media_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Multimodal.fingerprint(media.repartition(13))
      .select("media_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.size == 200)
  }
}
