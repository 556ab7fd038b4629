package graft

import graft.geo.CellIndex
import graft.io.WebPages
import graft.ops.SpatialJoins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-cluster-size scaling evidence (north_rule: throughput efficiency
  * ≥ 0.8 from N to 4N executors). No real cluster exists in this sandbox,
  * so per the driver's protocol the same job runs at local[8] (N) and
  * local[32] (4N) on the same input; efficiency = rows/s(32) / (4·rows/s(8)).
  *
  * Protocol notes (learned the hard way):
  *  - each measurement runs in a FRESH JVM — within one JVM, JIT/GC state
  *    makes second-session timings incomparable;
  *  - the input is materialized parquet (data at rest, like the real
  *    Common-Crawl table), so the measured job is scan → cell assignment →
  *    PIP join → aggregate, not in-memory generation;
  *  - the job must be large enough that fixed startup (~1s) is noise.
  *
  * Orchestrated by `tools/run_scaling.sh`. Modes:
  *   gen <nPages> <dir>      — materialize the feature table
  *   bench <cores> <dir>     — run the flagship, print one JSON line
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.host", "localhost")
    .getOrCreate()

  def main(args: Array[String]): Unit = args(0) match {
    case "gen" =>
      val (n, dir) = (args(1).toLong, args(2))
      val spark = session(32)
      spark.sparkContext.setLogLevel("WARN")
      // Z-order-cluster the table (sort within partitions by cell id): the
      // spatial-lake layout. Consecutive rows then probe neighbouring zones,
      // keeping the PIP working set cache-resident at any core count — and
      // it is also what enables cell-range partition pruning at 100 TB.
      val ci = CellIndex.Unit20
      WebPages.features(WebPages.pages(spark, n, 256))
        .select("id", "f", "x", "y")
        .withColumn("cell", ci.encodeCol(col("x"), col("y"), 10))
        .repartitionByRange(256, col("cell"))
        .sortWithinPartitions("cell")
        .drop("cell")
        .write.mode("overwrite").parquet(dir)
      WebPages.benchZones(spark, 4096).write.mode("overwrite").parquet(s"$dir-zones")
      println(s"""{"mode":"gen","pages":$n,"dir":"$dir"}""")
      spark.stop()

    case "bench" =>
      val (cores, dir) = (args(1).toInt, args(2))
      val variant = if (args.length > 3) args(3) else "jts"
      val spark = session(cores)
      spark.sparkContext.setLogLevel("WARN")
      val ci = CellIndex.Unit20
      import spark.implicits._

      def run(): Long = {
        val feats = spark.read.parquet(dir)
        val joined = variant match {
          case "box" => // pure-arithmetic refine (codegen; memory-bound)
            val zones = spark.read.parquet(s"$dir-zones")
            SpatialJoins.pointInBox(feats, zones, ci, 8, broadcastBoxes = true)
          case "jts" | "jtsfast" => // broadcast STRtree + prepared-geometry
            // refine — the north_star shape; "jtsfast" keeps the probe
            // inside codegen (primitive UDF + cached tree), "jts" is the
            // mapPartitions row path. Zones are 32-gons inflated 3× so the
            // candidate rate is ~1 per point — the compute-dense realistic
            // shape (complex polygon layers), not a bandwidth microbench.
            val zones = spark.read.parquet(s"$dir-zones")
              .map { r =>
                val (x0, y0, x1, y1) =
                  (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
                val (cx, cy) = ((x0 + x1) / 2, (y0 + y1) / 2)
                val (rx, ry) = ((x1 - x0) * 1.5, (y1 - y0) * 1.5)
                val coords = (0 to 32).map { k =>
                  val a = 2 * math.Pi * k / 32
                  new org.locationtech.jts.geom.Coordinate(
                    cx + rx * math.cos(a), cy + ry * math.sin(a))
                }.toArray
                coords(32) = coords(0)
                (r.getLong(0),
                  graft.geo.JtsGeo.toWkb(graft.geo.JtsGeo.factory.createPolygon(coords)))
              }.toDF("poly_id", "wkb")
            if (variant == "jtsfast")
              SpatialJoins.pointInPolygonBroadcastFast(feats.select("x", "y"), zones)
            else
              SpatialJoins.pointInPolygonBroadcast(feats.select("x", "y"), zones)
        }
        joined
          .withColumn("tile_id", ci.encodeCol(col("x"), col("y"), 8))
          .groupBy("tile_id", "poly_id").agg(count(lit(1)).as("n"))
          .count()
      }
      val rows = spark.read.parquet(dir).count()
      run() // warmup: codegen + page cache
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      val best = secs.min
      println(f"""{"mode":"bench","cores":$cores,"variant":"$variant","rows":$rows,"sec":$best%.3f,"rows_per_sec":${(rows / best).toLong}}""")
      spark.stop()
  }
}
