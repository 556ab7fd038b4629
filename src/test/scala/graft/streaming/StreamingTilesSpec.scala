package graft.streaming

import graft.SparkSpec
import graft.geo.CellIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class PageEvent(url: String, warc_ts: Timestamp, x: Double, y: Double)

class StreamingTilesSpec extends SparkSpec {

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("streaming tile counts with tumbling windows and watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PageEvent]
    val out = StreamingTiles.tileCounts(stream.toDF(), CellIndex.Unit20, 4,
      windowLen = "10 minutes")
    val q = out.writeStream.format("memory").queryName("tiles")
      .outputMode("complete").start()
    try {
      stream.addData(
        PageEvent("u1", ts(1), 1000, 1000), PageEvent("u2", ts(2), 1200, 1100),
        PageEvent("u3", ts(11), 1000, 1000), PageEvent("u4", ts(3), 900000, 900000))
      q.processAllAvailable()
      val rows = spark.sql("select cell, n from tiles").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // u1,u2 same cell same window → 2; u3 next window → 1; u4 far cell → 1
      assert(rows.map(_._2).sorted.toSeq == Seq(1L, 1L, 2L))
    } finally q.stop()
  }

  test("stateful url dedup within watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PageEvent]
    val q = StreamingTiles.dedupByUrl(stream.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      stream.addData(PageEvent("u1", ts(1), 0, 0), PageEvent("u1", ts(2), 0, 0),
        PageEvent("u2", ts(3), 0, 0))
      q.processAllAvailable()
      stream.addData(PageEvent("u1", ts(4), 0, 0)) // still duplicate
      q.processAllAvailable()
      val urls = spark.sql("select url from dedup").collect().map(_.getString(0))
      assert(urls.sorted.toSeq == Seq("u1", "u2"))
    } finally q.stop()
  }
}
