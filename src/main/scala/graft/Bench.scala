package graft

import graft.geo.CellIndex
import graft.io.WebPages
import graft.ops.SpatialJoins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * plus the flagship tile-assignment+PIP pipeline at a page scale tied to
  * the sf, and prints ONE JSON line. */
object Bench {

  /** The BASELINE.json metric query: pages → features → cell assignment →
    * PIP join vs zone layer → count per (tile, zone). Returns (rows, result
    * row count) where rows = feature rows processed. */
  def flagship(spark: SparkSession, nPages: Long, nZones: Int, level: Int): (Long, Long) = {
    val ci = CellIndex.Unit20
    val feats = WebPages.features(WebPages.pages(spark, nPages, 64))
    val zones = WebPages.benchZones(spark, nZones)
    val joined = SpatialJoins.pointInBox(feats, zones, ci, level, broadcastBoxes = true)
      .withColumn("tile_id", ci.encodeCol(col("x"), col("y"), level))
      .groupBy("tile_id", "poly_id").agg(count(lit(1)).as("n"))
    val resultRows = joined.count()
    // feature rows = nPages avg 2 features (1..3 uniform by id%3)
    val featRows = nPages * 2
    (featRows, resultRows)
  }

  def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // flagship scale: sf0.1 → 2M pages (~4M features); smaller sf → smaller
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nPages = math.max((20000000 * sf).toLong, 20000L)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, _) = time {
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      }
      name -> sec
    }
    val (pipSec, (featRows, _)) = time(flagship(spark, nPages, 4096, 8)) match {
      case (s, r) => (s, r)
    }
    val pipThroughput = featRows / pipSec

    val qs = (results :+ ("flagship_pip" -> pipSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipSec
    val totalStr = f"$total%.3f"
    println(
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"sf":"$sfDir","pip_feature_rows":$featRows,"pip_rows_per_sec":${pipThroughput.toLong}}""")
    spark.stop()
  }
}
