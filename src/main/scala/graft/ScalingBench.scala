package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north_rule: throughput efficiency
  * ≥ 0.8 from N to 4N executors). No real cluster exists in this sandbox,
  * so per the driver's protocol the same job runs at local[8] (N) and
  * local[32] (4N) on the same input; efficiency = rows/s(32) / (4·rows/s(8)).
  *
  * Run: `sbt -batch "runMain graft.ScalingBench [nPages]"` → markdown rows
  * for BENCH/BASELINE.md + one JSON line.
  */
object ScalingBench {

  def run(cores: Int, nPages: Long): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup (JIT + codegen) on a slice, then 3 measured runs — keep best
      Bench.flagship(spark, nPages / 10, 4096, 8)
      val secs = (1 to 3).map(_ => Bench.time(Bench.flagship(spark, nPages, 4096, 8))._1)
      secs.min
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(2000000L)
    val featRows = nPages * 2
    val s8 = run(8, nPages)
    val s32 = run(32, nPages)
    val (r8, r32) = (featRows / s8, featRows / s32)
    val eff = r32 / (4 * r8)
    println(f"| flagship_pip | $featRows | ${r8.toLong} | ${r32.toLong} | $eff%.3f | local[8] vs local[32], level-8 grid, 4096 zones |")
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"rows":$featRows,"rows_per_sec_8":${r8.toLong},"rows_per_sec_32":${r32.toLong},"sec_8":$s8%.2f,"sec_32":$s32%.2f}""")
  }
}
