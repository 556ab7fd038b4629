package graft.queries

import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline gates. The synthetic media table is deterministic
  * in media_id, so the full video chain — GIF encode → decode → frame
  * render → every-k sample — has closed-form frame counts and
  * centisecond timestamps the DuckDB oracle enumerates directly; any
  * drift in any codec stage breaks the gate. */
object MultimodalQueries {

  private val N = 200L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // real video modality end-to-end: animated-GIF payloads built row-side,
    // decoded by the hand-rolled codec, frames sampled every 2nd
    "q50_video_frames" -> ((s, _) => {
      val media = Multimodal.syntheticMediaPng(s, N, 8)
      Multimodal.extractFrames(media, everyK = 2)
        .filter(col("kind") === "video")
        .select(col("media_id"), col("frame_idx"), col("t_cs"))
        .orderBy("media_id", "frame_idx")
    }),

    // TRUE-bitstream video modality: MJPEG AVI payloads (AVI RIFF
    // container, independent JPEG frames) built row-side, container
    // parsed by the hand-rolled io/Avi codec, frames decoded by the
    // JDK's real JPEG codec, sampled every 2nd; dims, frame count, and
    // container-derived centisecond timestamps are closed-form
    "q60_video_avi" -> ((s, _) => {
      import s.implicits._
      val media = s.range(0, N, 1, 8).filter(_ % 3 == 0).map { id =>
        (id, "video", Multimodal.syntheticAvi(id,
          32 + (id % 4).toInt * 16, 32 + (id % 3).toInt * 16))
      }.toDF("media_id", "kind", "payload")
      val meta = Multimodal.decodeMetaReal(media)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.frames").as("n_frames"))
      Multimodal.extractFrames(media, everyK = 2)
        .select(col("media_id"), col("frame_idx"), col("t_cs"))
        .join(meta, "media_id")
        .select("media_id", "width", "height", "n_frames", "frame_idx", "t_cs")
        .orderBy("media_id", "frame_idx")
    }),

    // real audio modality: PCM16 WAV payloads built row-side, decoded by
    // the hand-rolled RIFF codec; the gate sticks to integer aggregates
    // (sample count, peak |v|, Σv²) so the oracle is value-exact
    "q52_audio" -> ((s, _) => {
      import s.implicits._
      s.range(0, N, 1, 8).map { id =>
        val n = (100 + id % 50).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i * 17) % 4001) - 2000).toShort)
        (id, Multimodal.Wav.encode(8000, 1, samples))
      }.toDF("media_id", "payload")
        .map { r =>
          val (rate, ch, samples) = Multimodal.Wav.decode(r.getAs[Array[Byte]](1))
          var peak = 0L; var sumSq = 0L
          samples.foreach { v =>
            val a = math.abs(v.toLong); if (a > peak) peak = a
            sumSq += v.toLong * v.toLong
          }
          (r.getLong(0), rate, ch, samples.length, peak, sumSq)
        }
        .toDF("media_id", "sample_rate", "channels", "n_samples", "peak_abs", "sum_sq")
        .orderBy("media_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q50_video_frames" ->
      s"""WITH v AS (SELECT range AS id FROM range($N) WHERE range % 3 = 0),
         f AS (SELECT id, unnest(range(0, 2 + id % 4, 2)) AS fi FROM v)
         SELECT id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST(fi * (2 + id % 10) AS INTEGER) AS t_cs
         FROM f ORDER BY media_id, frame_idx""",
    "q60_video_avi" ->
      s"""WITH v AS (SELECT range AS id FROM range($N) WHERE range % 3 = 0),
         f AS (SELECT id, unnest(range(0, 2 + id % 4, 2)) AS fi FROM v)
         SELECT id AS media_id,
           CAST(32 + (id % 4) * 16 AS INTEGER) AS width,
           CAST(32 + (id % 3) * 16 AS INTEGER) AS height,
           CAST(2 + id % 4 AS INTEGER) AS n_frames,
           CAST(fi AS INTEGER) AS frame_idx,
           CAST(fi * (CASE id % 3 WHEN 0 THEN 20 WHEN 1 THEN 10 ELSE 5 END)
             AS INTEGER) AS t_cs
         FROM f ORDER BY media_id, frame_idx""",
    "q52_audio" ->
      s"""WITH m AS (SELECT range AS id FROM range($N)),
         s AS (SELECT id, unnest(range(0, 100 + id % 50)) AS i FROM m),
         v AS (SELECT id, (id*31 + i*17) % 4001 - 2000 AS val FROM s)
         SELECT id AS media_id, 8000 AS sample_rate, 1 AS channels,
           CAST(count(*) AS INTEGER) AS n_samples,
           max(abs(val)) AS peak_abs, CAST(sum(val*val) AS BIGINT) AS sum_sq
         FROM v GROUP BY id ORDER BY media_id"""
  )
}
