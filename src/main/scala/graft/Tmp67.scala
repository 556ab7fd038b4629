package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** throwaway q67/q58 job profiler (deleted before commit) */
object Tmp67 {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, cs) = starts.getOrDefault(je.jobId, (0L, "?"))
        lines.add(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f  $cs")
      }
    })
    val fn = SparkEntry.queries(q)
    // warm pass
    fn(spark, "/root/testdata/sf0.1").count(); spark.catalog.clearCache()
    Thread.sleep(500); lines.clear()
    val t0 = System.nanoTime()
    fn(spark, "/root/testdata/sf0.1").count()
    val tot = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    Thread.sleep(1000)
    lines.forEach(println)
    println(f"TOTAL $tot%.3f")
    spark.stop()
  }
}
