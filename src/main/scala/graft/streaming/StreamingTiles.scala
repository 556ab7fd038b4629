package graft.streaming

import graft.geo.CellIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming surface (SURVEY.md §2.9 — additive; the reference is
  * batch-only). Ingests the web-page shape `(url, warc_ts, x, y, …)` as a
  * stream and provides:
  *  - watermarked stateful dedup by url (`dropDuplicatesWithinWatermark`),
  *  - tumbling-window tile-assignment counts per (window, cell).
  * Works on any streaming DataFrame (MemoryStream in tests; Kafka/file
  * sources in production) — the transforms are source-agnostic.
  */
object StreamingTiles {

  /** Stateful URL dedup bounded by the watermark. */
  def dedupByUrl(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("url")

  /** Tumbling-window counts per (window, tile cell): incremental version of
    * the flagship tile-assignment aggregation. */
  def tileCounts(pages: DataFrame, ci: CellIndex, level: Int,
                 windowLen: String = "10 minutes",
                 watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .withColumn("cell", ci.encodeCol(col("x"), col("y"), level))
      .groupBy(window(col("warc_ts"), windowLen), col("cell"))
      .agg(count(lit(1)).as("n"))
}
