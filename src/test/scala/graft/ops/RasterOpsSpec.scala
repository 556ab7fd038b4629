package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RasterOpsSpec extends SparkSpec {

  lazy val df = {
    val spark2 = spark
    import spark2.implicits._
    // 4 bands × 6 pixels
    Seq((1L, Seq(
      Seq(0.0, 30, 60, 90, 120, 150),
      Seq(10.0, 40, 70, 100, 130, 160),
      Seq(20.0, 50, 80, 110, 140, 170),
      Seq(99.0, 99, 99, 99, 99, 99)))).toDF("id", "bands")
  }

  test("selectBands keeps the first n (coco.py:152)") {
    val r = df.select(RasterOps.selectBands(col("bands"), 3).as("b")).head
    assert(r.getSeq[Seq[Double]](0).length == 3)
    assert(r.getSeq[Seq[Double]](0).head.head == 0.0)
  }

  test("grayscale is the per-pixel mean of the first 3 bands (coco.py:158-160)") {
    val g = df.select(RasterOps.grayscale(col("bands")).as("g"))
      .head.getSeq[Double](0)
    assert(g == Seq(10.0, 40, 70, 100, 130, 160))
  }

  test("bandStats yields min/max/mean per band") {
    val s = df.select(RasterOps.bandStats(col("bands")).as("s")).head.getSeq[org.apache.spark.sql.Row](0)
    assert(s(0).getDouble(0) == 0.0 && s(0).getDouble(1) == 150.0 && s(0).getDouble(2) == 75.0)
    assert(s(3).getDouble(2) == 99.0)
  }

  test("roboflowify rewrites tile paths (P18)") {
    val spark2 = spark
    import spark2.implicits._
    val t = graft.io.Coco.CocoTables(
      Seq(graft.model.CocoImage(0, "ds/tile_0-0.png", 10, 10)).toDS(),
      spark.emptyDataset[graft.model.CocoAnnotation],
      spark.emptyDataset[graft.model.CocoCategory])
    val out = CocoOps.roboflowify(t).images.head.fileName
    assert(out == "ds_tile_0-0.png")
  }
}
