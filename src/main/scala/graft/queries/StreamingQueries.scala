package graft.queries

import graft.streaming.StreamingTiles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.util.concurrent.atomic.AtomicInteger

/** Driver gate for the Structured-Streaming surface (SURVEY.md §2.9).
  *
  * q59 runs a REAL streaming query — MemoryStream source → watermarked
  * global url dedup ([[StreamingTiles.dedupByUrlGlobal]]) → memory sink —
  * over a FIXED three-batch sequence, then returns the sink as a batch
  * frame. The protocol is fully deterministic: each `addData` +
  * `processAllAvailable` pair is exactly one micro-batch, and the
  * watermark advances to max(event time) − delay at each batch boundary,
  * so which rows are late is closed-form. The DuckDB oracle replays the
  * batch protocol's outcome:
  *
  *   batch 1 (wm = epoch 0): u0..u49 on time → emitted; in-batch
  *     duplicates of u0..u9 → suppressed by state;
  *   batch 2 (wm = base+29): u60..u79 on time → emitted; "uLate" at
  *     base+5 is OLDER THAN THE WATERMARK → dropped on arrival (the
  *     watermark bites); a re-crawl of u5 → suppressed;
  *   batch 3 (wm = base+70): "uLate" re-arrives on time at base+200 →
  *     emitted (its late first try never claimed the url); a late
  *     duplicate of u60 → dropped; "uFinal" → emitted.
  *
  * Expected sink: u0..u49, u60..u79, uLate, uFinal — 72 urls, once each.
  */
object StreamingQueries {

  private val sinkId = new AtomicInteger(0)

  private val Base = 1700000000L

  private def event(url: String, offsetSec: Long): (String, java.sql.Timestamp) =
    (url, new java.sql.Timestamp((Base + offsetSec) * 1000L))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_stream_dedup" -> ((s, _) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val stream = MemoryStream[(String, java.sql.Timestamp)]
      val deduped = StreamingTiles.dedupByUrlGlobal(
        stream.toDF().toDF("url", "warc_ts"), watermark = "30 seconds")
      val sink = "q59_sink_" + sinkId.incrementAndGet()
      // state-store partitioning is fixed at query start from
      // spark.sql.shuffle.partitions; 4 is right-sized for this gate's
      // 72-key state (32 would pay 32 store commits per micro-batch)
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try deduped.select("url").writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      try {
        stream.addData((0 until 50).map(i => event(s"u$i", i)) ++
          (50 until 60).map(i => event(s"u${i - 50}", i)))
        q.processAllAvailable() // batch 1: max ts base+59 → wm base+29
        stream.addData((60 until 80).map(i => event(s"u$i", i)) ++
          Seq(event("uLate", 5), event("u5", 100)))
        q.processAllAvailable() // batch 2: max ts base+100 → wm base+70
        stream.addData(Seq(event("uLate", 200), event("u60", 1),
          event("uFinal", 201)))
        q.processAllAvailable() // batch 3
      } finally q.stop()
      s.table(sink).orderBy("url")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q59_stream_dedup" ->
      """SELECT url FROM (
           SELECT 'u'||range::VARCHAR AS url FROM range(50)
           UNION ALL SELECT 'u'||range::VARCHAR FROM range(60, 80)
           UNION ALL SELECT 'uLate'
           UNION ALL SELECT 'uFinal')
         ORDER BY url"""
  )
}
