package graft.pipeline

import graft.SparkSpec
import graft.geo.{JtsGeo, Proj}
import graft.io.Coco.CocoTables
import graft.model._
import graft.ops.Tiling

/** The reference regularises in EPSG:4326 (tolerance in degrees) and hops
  * back (coco2geojson.py:342-353) — this spec covers the layerCrs hop. */
class CrsHopSpec extends SparkSpec {

  // a raster in Web-Mercator meters near Sydney (~151.2E, 33.8S)
  val west = Proj.mercatorX(151.2); val north = Proj.mercatorY(-33.8)
  val raster = RasterMeta("r", 100, 100, 2.0, 0, west, 0, -2.0, north, "EPSG:3857")

  def tables(): CocoTables = {
    val spark2 = spark
    import spark2.implicits._
    val feats = {
      val g = JtsGeo.box(west + 20, north - 180, west + 120, north - 20)
      val e = g.getEnvelopeInternal
      Seq(Feature(0, JtsGeo.toWkb(g), e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, "b")).toDS()
    }
    GeojsonToCoco.run(feats, raster, GeojsonToCoco.Params(tileWidth = 100, tileHeight = 100))
  }

  test("3857 hop: simplify with a degree tolerance behaves; geometry returns in meters") {
    val spark2 = spark
    import spark2.implicits._
    val tiles = Tiling.tilesFor(raster, 100, 100).toDS()
    val t = tables()
    val out = CocoToGeojson.run(t, tiles,
      CocoToGeojson.Params(simplifyTolerance = 0.9, layerCrs = Some("EPSG:3857")))
      .collect()
    assert(out.length == 1)
    val g = JtsGeo.fromWkb(out.head.getAs[Array[Byte]](2))
    // output must still be in Mercator meters near the raster, not degrees
    val env = g.getEnvelopeInternal
    assert(env.getMinX > west && env.getMinX < west + 300, env.toString)
    // 0.9-degree tolerance (~100 km) flattens a 100 m box to very few points
    assert(g.getNumPoints <= 5)
  }

  test("UTM layer hop: regularisation in degrees, geometry returns in UTM meters") {
    val spark2 = spark
    import spark2.implicits._
    // raster in UTM zone 56 south meters near Sydney
    val (e0, n0) = Proj.utmForward(-33.8, 151.2, 56, north = false)
    val rasterUtm = RasterMeta("r", 100, 100, 2.0, 0, e0, 0, -2.0, n0, "EPSG:32756")
    val feats = {
      val g = JtsGeo.box(e0 + 20, n0 - 180, e0 + 120, n0 - 20)
      val env = g.getEnvelopeInternal
      Seq(Feature(0, JtsGeo.toWkb(g), env.getMinX, env.getMinY, env.getMaxX,
        env.getMaxY, "b")).toDS()
    }
    val t = GeojsonToCoco.run(feats, rasterUtm,
      GeojsonToCoco.Params(tileWidth = 100, tileHeight = 100))
    val tiles = Tiling.tilesFor(rasterUtm, 100, 100).toDS()
    val out = CocoToGeojson.run(t, tiles,
      CocoToGeojson.Params(simplifyTolerance = 0.9, layerCrs = Some("EPSG:32756")))
      .collect()
    assert(out.length == 1)
    val g = JtsGeo.fromWkb(out.head.getAs[Array[Byte]](2))
    val env = g.getEnvelopeInternal
    // back in UTM meters near the raster origin (not degrees, not Mercator)
    assert(env.getMinX > e0 && env.getMinX < e0 + 300, env.toString)
    assert(g.getNumPoints <= 5)
    // forward/inverse TM round-trip keeps vertices to sub-mm
    val plain = JtsGeo.fromWkb(CocoToGeojson.run(t, tiles, CocoToGeojson.Params())
      .collect().head.getAs[Array[Byte]](2))
    val pe = plain.getEnvelopeInternal
    assert(math.abs(env.getMinX - pe.getMinX) < 1e-3)
    assert(math.abs(env.getMaxY - pe.getMaxY) < 1e-3)
  }

  test("hop round trip is near-exact when no regularisation applies") {
    val spark2 = spark
    import spark2.implicits._
    val tiles = Tiling.tilesFor(raster, 100, 100).toDS()
    val t = tables()
    val plain = CocoToGeojson.run(t, tiles, CocoToGeojson.Params())
      .collect().head.getAs[Array[Byte]](2)
    val hopped = CocoToGeojson.run(t, tiles,
      CocoToGeojson.Params(layerCrs = Some("EPSG:3857")))
      .collect().head.getAs[Array[Byte]](2)
    // no simplify/mrr/ortho → hop disabled → identical
    assert(java.util.Arrays.equals(plain, hopped))
  }
}
