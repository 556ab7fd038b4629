package graft.pipeline

import graft.SparkSpec
import graft.geo.{JtsGeo, Proj}
import graft.model.{Feature, RasterMeta}

/** P16 parity (reference coordinates.py:194-198): the area filter measures
  * the clipped part in the layer's estimated UTM CRS. For a geographic
  * (EPSG:4326) layer the same polygon is ~1e-6 deg² but ~10,000 m² — a m²
  * threshold must flip the keep/drop decision between the two readings. */
class UtmAreaFilterSpec extends SparkSpec {

  // 100×100 px raster over Sydney-ish lon/lat (UTM zone 56 south),
  // 0.0001° pixels, north-up from (151.0, -32.99)
  val raster = RasterMeta("r", 100, 100, 0.0001, 0, 151.0, 0, -0.0001, -32.99, "EPSG:4326")

  def features = {
    val spark2 = spark
    import spark2.implicits._
    val g = JtsGeo.box(151.0005, -32.9955, 151.0015, -32.9945) // 0.001° square
    val e = g.getEnvelopeInternal
    Seq(Feature(0, JtsGeo.toWkb(g), e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, "b"))
      .toDS()
  }

  test("m² threshold keeps the polygon only under the UTM reading") {
    // sanity: the UTM area is ~0.001°·cos(33°)·111km × 0.001°·111km ≈ 1e4 m²
    val (zone, north) = Proj.estimateUtmZone(151.0005, -32.9955, 151.0015, -32.9945)
    assert(zone == 56 && !north)
    val poly = JtsGeo.box(151.0005, -32.9955, 151.0015, -32.9945)
    val utmArea = Proj.utmPolygonArea(poly, zone, north)
    assert(utmArea > 9000 && utmArea < 12000, s"utm area = $utmArea")

    val pGeo = GeojsonToCoco.Params(tileWidth = 100, tileHeight = 100,
      areaFilter = 5000.0, layerCrs = Some("EPSG:4326"))
    val kept = GeojsonToCoco.run(features, raster, pGeo).annotations.count()
    assert(kept == 1, "UTM reading (~1e4 m²) must pass the 5000 m² filter")

    // same threshold against layer-unit (deg²) area silently drops it —
    // exactly the reference bug the UTM wiring prevents
    val pLayer = GeojsonToCoco.Params(tileWidth = 100, tileHeight = 100,
      areaFilter = 5000.0, layerCrs = None)
    val dropped = GeojsonToCoco.run(features, raster, pLayer).annotations.count()
    assert(dropped == 0)
  }

  test("zero filter on a geographic layer still drops zero-area parts only") {
    val p = GeojsonToCoco.Params(tileWidth = 100, tileHeight = 100,
      areaFilter = 0.0, layerCrs = Some("EPSG:4326"))
    assert(GeojsonToCoco.run(features, raster, p).annotations.count() == 1)
  }
}
