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

  /** Stateful URL dedup bounded by the watermark: key state is EVICTED
    * once the watermark passes the recorded event time + delay, so state
    * size tracks the reordering window, not the url universe — the
    * bounded-state default (gated q64; a post-eviction re-crawl re-emits). */
  def dedupByUrl(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("url")

  /** Globally-stateful URL dedup over a watermarked stream: every url is
    * emitted at its FIRST on-time occurrence and suppressed forever after
    * (url-keyed state, never evicted), while the watermark gates LATE
    * ARRIVALS — an event whose `warc_ts` is older than the current
    * watermark is dropped on arrival, before it can claim its url. This
    * is the admission-dedup a crawl frontier runs: bounded reordering is
    * absorbed by the delay, and re-crawls of a seen url never re-emit.
    * Deterministic for a fixed batch sequence (the watermark advances to
    * max(event time) − delay at each batch boundary), which is what the
    * q59 gate's DuckDB oracle replays.
    *
    * STATE STORY AT 10^12 URLS: never-evicted url state must live in the
    * RocksDB state store provider (off-heap/on-disk per partition), not
    * the default in-heap HDFS-backed store — the q59 gate sets
    * `spark.sql.streaming.stateStore.providerClass` accordingly and
    * StreamingTilesSpec asserts RocksDB metrics appear in the query
    * progress. Pipelines that only need reordering-window dedup should
    * prefer [[dedupByUrl]], whose state is watermark-TTL'd (gated q64). */
  def dedupByUrlGlobal(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .dropDuplicates("url")

  /** Tumbling-window counts per (window, tile cell): incremental version of
    * the flagship tile-assignment aggregation. */
  def tileCounts(pages: DataFrame, ci: CellIndex, level: Int,
                 windowLen: String = "10 minutes",
                 watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .withColumn("cell", ci.encodeCol(col("x"), col("y"), level))
      .groupBy(window(col("warc_ts"), windowLen), col("cell"))
      .agg(count(lit(1)).as("n"))

  /** Gap-based crawl sessions per host, streaming: Spark's native
    * `session_window` merges events closer than `gap` into one growing
    * window whose state finalizes when the watermark passes its end — the
    * incremental twin of the batch sessionization gate (q36). Output per
    * closed session: host, start/end, event count. */
  def hostSessions(pages: DataFrame, hostCol: String, gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .groupBy(session_window(col("warc_ts"), gap), col(hostCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(hostCol), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))
}
