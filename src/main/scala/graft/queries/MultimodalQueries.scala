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
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q50_video_frames" ->
      s"""WITH v AS (SELECT range AS id FROM range($N) WHERE range % 3 = 0),
         f AS (SELECT id, unnest(range(0, 2 + id % 4, 2)) AS fi FROM v)
         SELECT id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST(fi * (2 + id % 10) AS INTEGER) AS t_cs
         FROM f ORDER BY media_id, frame_idx"""
  )
}
