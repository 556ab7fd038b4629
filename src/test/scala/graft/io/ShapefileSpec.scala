package graft.io

import graft.SparkSpec
import graft.geo.JtsGeo
import org.locationtech.jts.geom.Coordinate

class ShapefileSpec extends SparkSpec {

  val gf = JtsGeo.factory

  def polyWithHole = {
    val shell = gf.createLinearRing(Array(
      new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10),
      new Coordinate(0, 10), new Coordinate(0, 0)))
    val hole = gf.createLinearRing(Array(
      new Coordinate(2, 2), new Coordinate(4, 2), new Coordinate(4, 4),
      new Coordinate(2, 4), new Coordinate(2, 2)))
    gf.createPolygon(shell, Array(hole))
  }

  def multi = gf.createMultiPolygon(Array(
    JtsGeo.box(20, 20, 30, 30), JtsGeo.box(40, 40, 45, 45)))

  test("write → parse round trip: polygon with hole + multipolygon + attributes") {
    val tmp = java.nio.file.Files.createTempDirectory("shp")
    Shapefile.write(s"$tmp/layer",
      Seq(polyWithHole -> Map("class" -> "building", "height" -> "12"),
        multi -> Map("class" -> "road", "height" -> "")),
      fields = Seq("class" -> 16, "height" -> 8))
    val shpBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/layer.shp"))
    val geoms = Shapefile.parseShp(shpBytes)
    assert(geoms.length == 2)
    assert(geoms(0).getArea == 100.0 - 4.0, "hole must subtract")
    assert(geoms(0).equalsTopo(polyWithHole))
    assert(geoms(1).getNumGeometries == 2 && geoms(1).getArea == 125.0)
    val dbfBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/layer.dbf"))
    val props = Shapefile.parseDbf(dbfBytes)
    assert(props == Seq(
      Map("class" -> "building", "height" -> "12"),
      Map("class" -> "road", "height" -> "")))
  }

  test("distributed read pairs .shp with .dbf and assigns global featureIds") {
    val tmp = java.nio.file.Files.createTempDirectory("shpread")
    Shapefile.write(s"$tmp/a", Seq(polyWithHole -> Map("class" -> "building")),
      fields = Seq("class" -> 16))
    Shapefile.write(s"$tmp/b", Seq(multi -> Map("class" -> "road")),
      fields = Seq("class" -> 16))
    val feats = Shapefile.read(spark, tmp.toString).collect().sortBy(_.featureId)
    assert(feats.length == 2)
    assert(feats.map(_.featureId).toSeq == Seq(0L, 1L))
    // (path, record) order: a.shp before b.shp
    assert(feats.map(_.zoneName).toSeq == Seq("building", "road"))
    assert(feats(0).props == Map("class" -> "building"))
    assert(JtsGeo.fromWkb(feats(0).wkb).getArea == 96.0)
    assert((feats(1).xmin, feats(1).ymax) == ((20.0, 45.0)))
  }

  test("end-to-end: shapefile layer drives geojson2coco like any vector source") {
    val tmp = java.nio.file.Files.createTempDirectory("shp2coco")
    // two buildings + one road inside a 100×80 px, 2 m/px raster at (1000, 2000)
    Shapefile.write(s"$tmp/layer", Seq(
      JtsGeo.box(1010, 1930, 1050, 1970) -> Map("class" -> "building"),
      JtsGeo.box(1070, 1930, 1090, 1950) -> Map("class" -> "road"),
      JtsGeo.box(1010, 1850, 1030, 1870) -> Map("class" -> "building")),
      fields = Seq("class" -> 16))
    val feats = Shapefile.read(spark, tmp.toString)
    val raster = graft.model.RasterMeta("r", 100, 80, 2.0, 0, 1000.0, 0, -2.0, 2000.0, "local")
    val tables = graft.pipeline.GeojsonToCoco.run(feats, raster,
      graft.pipeline.GeojsonToCoco.Params(tileWidth = 100, tileHeight = 80))
    val cats = tables.categories.collect().sortBy(_.id)
    assert(cats.map(c => (c.id, c.name)).toSeq == Seq((0, "building"), (1, "road")))
    val anns = tables.annotations.collect().sortBy(_.id)
    assert(anns.length == 3)
    // first building: world box → pixel box cols 5..25, rows 15..35
    assert(anns(0).bbox.toSeq == Seq(5.0, 15.0, 20.0, 20.0))
    assert(anns(0).area == 400.0)
  }

  test("random boxes round-trip through the polygon record codec") {
    val rnd = new scala.util.Random(42)
    val polys = (0 until 25).map { _ =>
      val x0 = rnd.nextDouble() * 1000; val y0 = rnd.nextDouble() * 1000
      JtsGeo.box(x0, y0, x0 + 1 + rnd.nextDouble() * 500, y0 + 1 + rnd.nextDouble() * 500)
    }
    val tmp = java.nio.file.Files.createTempDirectory("shprand")
    Shapefile.write(s"$tmp/r", polys.map(p => p -> Map("class" -> "c")),
      fields = Seq("class" -> 4))
    val back = Shapefile.parseShp(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/r.shp")))
    assert(back.length == polys.length)
    polys.zip(back).foreach { case (a, b) => assert(a.equalsTopo(b), s"$a vs $b") }
  }

  test("nested shells: island-in-lake assigns each hole to its innermost shell only") {
    // outer shell 0..10 with lake hole 2..8; island shell 4..6 inside the
    // lake with pond hole 4.5..5.5 — the outer shell also covers the pond,
    // so a per-shell independent filter would duplicate the pond hole
    val outer = gf.createPolygon(
      gf.createLinearRing(JtsGeo.box(0, 0, 10, 10).getExteriorRing.getCoordinates),
      Array(gf.createLinearRing(JtsGeo.box(2, 2, 8, 8).getExteriorRing.getCoordinates)))
    val island = gf.createPolygon(
      gf.createLinearRing(JtsGeo.box(4, 4, 6, 6).getExteriorRing.getCoordinates),
      Array(gf.createLinearRing(JtsGeo.box(4.5, 4.5, 5.5, 5.5).getExteriorRing.getCoordinates)))
    val mp = gf.createMultiPolygon(Array(outer, island))
    val tmp = java.nio.file.Files.createTempDirectory("shpnest")
    Shapefile.write(s"$tmp/n", Seq(mp -> Map("class" -> "c")), fields = Seq("class" -> 4))
    val back = Shapefile.parseShp(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/n.shp"))).head
    // (100-36) + (4-1) = 67; hole duplication would subtract the pond twice
    assert(math.abs(back.getArea - 67.0) < 1e-9, s"area ${back.getArea}")
    assert(back.isValid, "duplicated holes make the geometry invalid")
    assert(back.equalsTopo(mp))
  }

  test("boundary-touching hole between adjacent shells assigns to the shell it punctures") {
    // two equal-area shells sharing edge x=10; the hole's first vertex
    // touches the shared edge at ONE point but its interior is in the
    // RIGHT shell — a first-vertex covers test ties between both shells
    val left = JtsGeo.box(0, 0, 10, 10)
    val right = gf.createPolygon(
      gf.createLinearRing(JtsGeo.box(10, 0, 20, 10).getExteriorRing.getCoordinates),
      Array(gf.createLinearRing(Array(
        new Coordinate(10, 3), new Coordinate(12, 2), new Coordinate(12, 4),
        new Coordinate(10, 3)))))
    val mp = gf.createMultiPolygon(Array(left, right))
    val tmp = java.nio.file.Files.createTempDirectory("shpedge")
    Shapefile.write(s"$tmp/e", Seq(mp -> Map("class" -> "c")), fields = Seq("class" -> 4))
    val back = Shapefile.parseShp(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/e.shp"))).head
    assert(math.abs(back.getArea - (100.0 + 98.0)) < 1e-9, s"area ${back.getArea}")
    assert(back.equalsTopo(mp))
  }

  test("point and polyline shape types parse") {
    // hand-build a tiny .shp with one Point record
    val b = java.nio.ByteBuffer.allocate(100 + 8 + 20)
    b.order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994); b.putInt(24, (100 + 28) / 2)
    b.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000); b.putInt(32, 1)
    b.order(java.nio.ByteOrder.BIG_ENDIAN)
    b.position(100); b.putInt(1); b.putInt(10)
    b.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(1); b.putDouble(3.5); b.putDouble(-7.25)
    val geoms = Shapefile.parseShp(b.array())
    assert(geoms.length == 1)
    val p = geoms.head.asInstanceOf[org.locationtech.jts.geom.Point]
    assert(p.getX == 3.5 && p.getY == -7.25)
  }
}
