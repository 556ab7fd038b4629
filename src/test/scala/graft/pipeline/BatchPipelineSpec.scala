package graft.pipeline

import graft.SparkSpec
import graft.geo.JtsGeo
import graft.lake.Lake
import graft.model.{Feature, RasterMeta}
import org.apache.spark.sql.functions._

class BatchPipelineSpec extends SparkSpec {

  def raster(id: String, west: Double): RasterMeta =
    RasterMeta(id, 80, 80, 2.0, 0, west, 0, -2.0, 2000.0, "local")

  def features(west: Double) = {
    val spark2 = spark
    import spark2.implicits._
    val g = JtsGeo.box(west + 10, 1900, west + 50, 1950)
    val e = g.getEnvelopeInternal
    Seq(Feature(0, JtsGeo.toWkb(g), e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, "building"))
      .toDS()
  }

  test("batch run concats pairs with global ids; rerun resumes from checkpoints") {
    val lake = new Lake(java.nio.file.Files.createTempDirectory("bp").toString, spark)
    val pairs = Seq(
      (raster("rA", 1000.0), features(1000.0)),
      (raster("rB", 5000.0), features(5000.0)))
    val p = GeojsonToCoco.Params(tileWidth = 80, tileHeight = 80)

    val out = BatchPipeline.run(lake, "job", pairs, p)
    val imgs = out.images.collect().sortBy(_.id)
    assert(imgs.length == 2)
    assert(imgs.map(_.fileName).toSeq == Seq("0_tile_0-0.png", "1_tile_0-0.png"))
    assert(out.annotations.collect().map(_.id).sorted.toSeq == Seq(0L, 1L))
    assert(out.categories.count() == 1) // "building" deduped by name

    // all 6 stages checkpointed; rerun must read back, not recompute
    assert(lake.completedStages("job").size == 6)
    val out2 = BatchPipeline.run(lake, "job", pairs, p)
    assert(out2.annotations.collect().map(a => (a.id, a.imageId, a.area)).toSet ==
      out.annotations.collect().map(a => (a.id, a.imageId, a.area)).toSet)

    // lineage captured rows for each stage
    assert(lake.lineage().where(col("jobId") === "job").count() >= 6)
  }
}
