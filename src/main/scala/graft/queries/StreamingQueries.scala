package graft.queries

import graft.geo.CellIndex
import graft.streaming.StreamingTiles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Driver gates for the Structured-Streaming surface (SURVEY.md §2.9).
  *
  * Every gate runs a REAL streaming query — MemoryStream source →
  * transform → memory sink — over a FIXED batch protocol, then returns
  * the sink as a batch frame. The protocol is fully deterministic: each
  * `addData` + `processAllAvailable` pair is exactly one micro-batch, the
  * watermark advances to max(event time) − delay at each batch END, and
  * late rows are filtered against the PREVIOUS batch's watermark — so
  * which rows are late / which windows close is closed-form, and each
  * DuckDB oracle replays the protocol's outcome.
  *
  * q59 — globally-stateful url dedup (`dropDuplicates`): url-keyed state
  * is never evicted (frontier semantics: a re-crawl never re-emits);
  * the watermark gates late arrivals only. THE STATE STORY AT 10^12
  * URLS: the gate runs under the RocksDB state store provider — state
  * lives off-heap/on-disk per partition, not in executor heap, which is
  * the only configuration where never-evicted url state scales; the
  * provider conf is set at query start exactly as a production job would
  * (RocksDB-specific store metrics are asserted in StreamingTilesSpec).
  *
  * q64 — the WATERMARK-TTL'd dedup arm (`dropDuplicatesWithinWatermark`):
  * key state is EVICTED once the watermark passes the recorded event
  * time + delay, so a url seen again after eviction re-emits. This is
  * the bounded-state default for pipelines that only need
  * reordering-window dedup. Protocol: uA emits in batch 1, its state
  * expires behind the advancing watermark, and a batch-3 re-crawl emits
  * uA AGAIN (count 2 in the sink); an in-window duplicate (uF) stays
  * suppressed and a below-watermark arrival (uB re-crawl) is dropped
  * late. The protocol is insensitive to whether duplicate arrivals
  * extend the recorded expiry (both readings give the same outcome).
  *
  * q65 — tumbling-window tile counts (the incremental twin of the q13
  * batch aggregation): windows emit on close (append mode), i.e. when
  * the watermark passes the window end; the still-open tail window
  * never reaches the sink, and a replay aimed at an already-closed
  * window is dropped (windowed-agg lateness is judged by WINDOW END vs
  * the watermark, not raw event time — the oracle would catch either a
  * double count or a duplicate window row).
  *
  * q66 — gap-based host sessions (`session_window`, the incremental twin
  * of the q36 batch sessionization): sessions merge across batches
  * while open and emit once the watermark passes their end.
  */
object StreamingQueries {

  private val sinkId = new AtomicInteger(0)

  private val Base = 1700000000L

  /** 10-minute-aligned base so tumbling-window boundaries are closed-form
    * (Spark aligns windows to the 1970 epoch; 1700000400 % 600 == 0). */
  private val AlignedBase = 1700000400L

  private def ts(base: Long, offsetSec: Long): java.sql.Timestamp =
    new java.sql.Timestamp((base + offsetSec) * 1000L)

  private def event(url: String, offsetSec: Long): (String, java.sql.Timestamp) =
    (url, ts(Base, offsetSec))

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the session confs set (state-store provider class and
    * shuffle partitions are both fixed at QUERY START, so they must be in
    * place around `.start()`), restoring prior values after. */
  private def withStreamConfs[T](s: SparkSession, confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) =>
      k -> (try Some(s.conf.get(k)) catch { case _: Throwable => None })
    }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

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
      // 72-key state (32 would pay 32 store commits per micro-batch).
      // RocksDB provider: the never-evicted url state lives off-heap —
      // the 10^12-url configuration, asserted working by this gate.
      val q = withStreamConfs(s,
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.providerClass" -> RocksDb) {
        deduped.select("url").writeStream
          .format("memory").queryName(sink).outputMode("append").start()
      }
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
    }),

    "q64_stream_dedup_ttl" -> ((s, _) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val stream = MemoryStream[(String, java.sql.Timestamp)]
      val deduped = StreamingTiles.dedupByUrl(
        stream.toDF().toDF("url", "warc_ts"), watermark = "30 seconds")
      val sink = "q64_sink_" + sinkId.incrementAndGet()
      val q = withStreamConfs(s,
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.providerClass" -> RocksDb) {
        deduped.select("url").writeStream
          .format("memory").queryName(sink).outputMode("append").start()
      }
      try {
        // batch 1: uA emits (dup at +10 suppressed in-window), uB emits;
        // wm → base−10
        stream.addData(Seq(event("uA", 0), event("uA", 10), event("uB", 20)))
        q.processAllAvailable()
        // batch 2: filler advances wm to base+70 → uA/uB state (expiry
        // ≤ base+40 under either expiry reading) is evicted behind it
        stream.addData(Seq(event("uF", 100)))
        q.processAllAvailable()
        // batch 3: uA re-crawl at +110 re-EMITS (state evicted);
        // uB at +50 < wm base+70 → dropped late;
        // uF dup at +105 still in window → suppressed
        stream.addData(Seq(event("uA", 110), event("uB", 50), event("uF", 105)))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).groupBy("url").agg(count(lit(1)).as("n_emits")).orderBy("url")
    }),

    "q65_stream_tiles" -> ((s, _) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val stream = MemoryStream[(String, java.sql.Timestamp, Double, Double)]
      // same hash-strided point layout as the q12/q13 batch gates, so the
      // oracle replays the cell arithmetic in integer SQL
      def ev(i: Long): (String, java.sql.Timestamp, Double, Double) =
        (s"u$i", ts(AlignedBase, i),
          ((i * 2654435761L) % 1048576L).toDouble,
          ((i * 2246822519L) % 1048576L).toDouble)
      val tiles = StreamingTiles.tileCounts(
        stream.toDF().toDF("url", "warc_ts", "x", "y"),
        CellIndex.Unit20, level = 6,
        windowLen = "10 minutes", watermark = "60 seconds")
      val sink = "q65_sink_" + sinkId.incrementAndGet()
      val q = withStreamConfs(s,
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.providerClass" -> RocksDb) {
        tiles.select(col("window.start").cast("long").as("win_start"),
            col("cell"), col("n")).writeStream
          .format("memory").queryName(sink).outputMode("append").start()
      }
      try {
        // batch 1: W0 = [base, base+600) fills; wm → base+239; no window
        // closed yet, sink stays empty
        stream.addData((0L until 300L).map(ev))
        q.processAllAvailable()
        // batch 2: W1 events; wm → base+689 closes W0 (emitted once,
        // final). NOTE windowed-agg late semantics: an event is dropped
        // only when its WINDOW END is behind the watermark — a
        // below-watermark event for a still-open window would count.
        stream.addData((650L until 750L).map(ev))
        q.processAllAvailable()
        // batch 3: a lone W2 event advances wm to base+1390 → W1 closes;
        // the i=550 REPLAY targets the already-CLOSED W0 (end base+600 <
        // wm base+689) → dropped; admitting it would re-open W0 and emit
        // a duplicate window row, which the oracle would catch. W2 never
        // closes and never reaches the sink.
        stream.addData(Seq(ev(1450L), ev(550L)))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).orderBy("win_start", "cell")
    }),

    "q66_stream_sessions" -> ((s, _) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val stream = MemoryStream[(String, java.sql.Timestamp)]
      val sessions = StreamingTiles.hostSessions(
        stream.toDF().toDF("host", "warc_ts"), "host",
        gap = "30 seconds", watermark = "60 seconds")
      val sink = "q66_sink_" + sinkId.incrementAndGet()
      def ev(host: String, off: Long) = (host, ts(Base, off))
      val q = withStreamConfs(s,
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.providerClass" -> RocksDb) {
        sessions.select(col("host"), col("sess_start").cast("long").as("sess_start"),
            col("sess_end").cast("long").as("sess_end"), col("n_events")).writeStream
          .format("memory").queryName(sink).outputMode("append").start()
      }
      try {
        // batch 1: A session [0,50) grows over 3 events; B session [5,35)
        stream.addData(Seq(ev("hostA", 0), ev("hostA", 10), ev("hostA", 20),
          ev("hostB", 5)))
        q.processAllAvailable()
        // batch 2: B@25 MERGES into B's open session → [5,55); A@300
        // opens a new session and advances wm to base+240, closing
        // A[0,50)×3 and B[5,55)×2
        stream.addData(Seq(ev("hostB", 25), ev("hostA", 300)))
        q.processAllAvailable()
        // batch 3: B@600 advances wm to base+540, closing A[300,330)×1;
        // B's own session stays open and never reaches the sink
        stream.addData(Seq(ev("hostB", 600)))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).orderBy("host", "sess_start")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q59_stream_dedup" ->
      """SELECT url FROM (
           SELECT 'u'||range::VARCHAR AS url FROM range(50)
           UNION ALL SELECT 'u'||range::VARCHAR FROM range(60, 80)
           UNION ALL SELECT 'uLate'
           UNION ALL SELECT 'uFinal')
         ORDER BY url""",
    "q64_stream_dedup_ttl" ->
      """SELECT url, n_emits FROM (VALUES
           ('uA', CAST(2 AS BIGINT)), ('uB', CAST(1 AS BIGINT)),
           ('uF', CAST(1 AS BIGINT))) AS t(url, n_emits)
         ORDER BY url""",
    "q65_stream_tiles" ->
      s"""WITH ev AS (
           SELECT range AS i FROM range(300)
           UNION ALL SELECT range FROM range(650, 750)),
         pts AS (SELECT 1700000400 + i AS t,
             (i*2654435761) % 1048576 AS px,
             (i*2246822519) % 1048576 AS py
           FROM ev)
         SELECT (t // 600) * 600 AS win_start,
           ${CellIndex.packSql(6, "px>>14", "py>>14")} AS cell,
           count(*) AS n
         FROM pts GROUP BY 1, 2 ORDER BY 1, 2""",
    "q66_stream_sessions" ->
      """SELECT host, CAST(sess_start AS BIGINT) AS sess_start,
           CAST(sess_end AS BIGINT) AS sess_end, n_events FROM (VALUES
           ('hostA', 1700000000, 1700000050, CAST(3 AS BIGINT)),
           ('hostA', 1700000300, 1700000330, CAST(1 AS BIGINT)),
           ('hostB', 1700000005, 1700000055, CAST(2 AS BIGINT)))
           AS t(host, sess_start, sess_end, n_events)
         ORDER BY host, sess_start"""
  )
}
