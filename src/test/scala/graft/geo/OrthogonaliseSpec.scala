package graft.geo

import graft.SparkSpec
import org.locationtech.jts.geom.Coordinate

/** Property tests + GOLDEN PARITY for the orthogonalise kernel. The golden
  * fixtures (src/test/resources/ortho_golden.json) are produced by running
  * the REFERENCE kernel's own pure-math functions (exec'd from
  * orthogonalise.py) with its geopandas rotation replicated in closed form
  * — see tools/gen_ortho_golden.py. The property tests keep asserting the
  * documented postconditions (SURVEY.md G3: output angles ∈ {90°,180°} mod
  * skew-tolerance skips) on top. */
class OrthogonaliseSpec extends SparkSpec {

  def ring(pts: (Double, Double)*) =
    JtsGeo.factory.createPolygon(
      (pts :+ pts.head).map { case (x, y) => new Coordinate(x, y) }.toArray)

  /** planar corner angles of a closed ring, degrees */
  def cornerAngles(p: org.locationtech.jts.geom.Polygon): Seq[Double] = {
    val cs = p.getExteriorRing.getCoordinates.dropRight(1)
    cs.indices.map { i =>
      val a = cs((i - 1 + cs.length) % cs.length); val b = cs(i); val c = cs((i + 1) % cs.length)
      val v1 = math.atan2(a.y - b.y, a.x - b.x)
      val v2 = math.atan2(c.y - b.y, c.x - b.x)
      var d = math.toDegrees(v2 - v1); while (d < 0) d += 360; while (d >= 360) d -= 360
      d
    }
  }

  val base = 0.001 // ~100 m at the equator, in degrees

  test("jittered near-rectangle comes out right-angled") {
    // rectangle at lon 150.6 / lat -33.7 with vertex jitter ~4% of side
    val jit = Seq((0.00002, -0.00003), (-0.00004, 0.00002), (0.00003, 0.00004),
      (-0.00002, -0.00002))
    val p = ring(
      (150.6 + jit(0)._1, -33.7 + jit(0)._2),
      (150.6 + base + jit(1)._1, -33.7 + jit(1)._2),
      (150.6 + base + jit(2)._1, -33.7 + base + jit(2)._2),
      (150.6 + jit(3)._1, -33.7 + base + jit(3)._2))
    val o = Orthogonalise(p)
    assert(o.isValid && o.getArea > 0)
    cornerAngles(o).foreach { a =>
      val dev = math.min(math.abs(a - 90), math.abs(a - 270))
      assert(dev < 1.5, s"corner angle $a not right")
    }
  }

  test("rotated rectangle (well below 45°) is squared up and rotated back") {
    // rectangle rotated 12°: algorithm rotates by median deviation, averages,
    // rotates back — output corners must be right angles, area preserved ~.
    // Placed at the equator where degree-space rotation equals ground-truth
    // rotation (at high latitudes a degree-space rotation is anisotropic and
    // not a rigid rotation of the actual building).
    val rot = math.toRadians(12)
    def r(x: Double, y: Double) =
      (150.0 + x * math.cos(rot) - y * math.sin(rot),
        0.001 + x * math.sin(rot) + y * math.cos(rot))
    val p = ring(r(0, 0), r(2 * base, 0), r(2 * base, base), r(0, base))
    val o = Orthogonalise(p)
    cornerAngles(o).foreach { a =>
      val dev = math.min(math.abs(a - 90), math.abs(a - 270))
      assert(dev < 1.0, s"corner angle $a")
    }
    assert(math.abs(o.getArea - p.getArea) / p.getArea < 0.05)
  }

  test("L-shape: all six corners become right angles") {
    val p = ring(
      (150.0, -30.0), (150.0 + 2 * base, -30.0),
      (150.0 + 2 * base, -30.0 + base * 1.02), (150.0 + base * 1.01, -30.0 + base),
      (150.0 + base, -30.0 + 2 * base), (150.0 - 0.00002, -30.0 + 2 * base))
    val o = Orthogonalise(p)
    assert(o.getExteriorRing.getCoordinates.length == 7)
    cornerAngles(o).foreach { a =>
      val dev = math.min(math.abs(a - 90), math.abs(a - 270))
      assert(dev < 2.0, s"corner angle $a")
    }
  }

  test("45-degree skewed walls within tolerance are preserved") {
    // a bay-window corner at ~45° must NOT be flattened (skewTolerance=15)
    val p = ring(
      (150.0, -30.0), (150.0 + 2 * base, -30.0),
      (150.0 + 2 * base, -30.0 + base),
      (150.0 + 1.5 * base, -30.0 + 1.5 * base), // 45° wall
      (150.0, -30.0 + 1.5 * base))
    val o = Orthogonalise(p)
    val angles = cornerAngles(o)
    // the two corners adjoining the 45° wall stay near 135° interior
    // (cornerAngles reports the reflex 225° for clockwise rings)
    assert(angles.count(a =>
      math.min(math.abs(a - 135), math.abs(a - 225)) < 10) >= 2, angles.toString)
  }

  test("holes are orthogonalised too and survive reassembly") {
    val shell = ring((150.0, -30.0), (150.0 + 4 * base, -30.0),
      (150.0 + 4 * base, -30.0 + 4 * base), (150.0, -30.0 + 4 * base))
    val hole = Seq((150.0 + base, -30.0 + base), (150.0 + 2 * base, -30.0 + base * 1.01),
      (150.0 + 2 * base, -30.0 + 2 * base), (150.0 + base * 0.99, -30.0 + 2 * base))
    val p = JtsGeo.factory.createPolygon(
      shell.getExteriorRing,
      Array(JtsGeo.factory.createLinearRing(
        (hole :+ hole.head).map { case (x, y) => new Coordinate(x, y) }.toArray)))
    val o = Orthogonalise(p)
    assert(o.getNumInteriorRing == 1)
    assert(o.getArea < shell.getArea)
  }

  test("golden parity: output coordinates match the reference kernel run on the same inputs") {
    val text = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/ortho_golden.json")).mkString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    val names = root.fieldNames()
    var checked = 0
    while (names.hasNext) {
      val name = names.next()
      val fix = root.get(name)
      def pts(key: String): Array[Coordinate] = {
        val arr = fix.get(key)
        (0 until arr.size()).map { i =>
          new Coordinate(arr.get(i).get(0).asDouble(), arr.get(i).get(1).asDouble())
        }.toArray
      }
      val input = JtsGeo.factory.createPolygon(pts("input"))
      val expected = pts("expected")
      val got = Orthogonalise(input, 15, 15).getExteriorRing.getCoordinates
      assert(got.length == expected.length, s"$name: ${got.length} vs ${expected.length} pts")
      for (i <- expected.indices) {
        // 1e-9 deg ≈ 0.1 mm — bit-level parity modulo summation order
        assert(math.abs(got(i).x - expected(i).x) < 1e-9 &&
          math.abs(got(i).y - expected(i).y) < 1e-9,
          s"$name pt $i: (${got(i).x},${got(i).y}) vs (${expected(i).x},${expected(i).y})")
      }
      checked += 1
    }
    assert(checked == 4)
  }

  test("compass bearing matches closed forms") {
    assert(math.abs(Orthogonalise.compassBearing(0, 0, 1, 0) - 0.0) < 1e-9) // due north
    assert(math.abs(Orthogonalise.compassBearing(0, 0, 0, 1) - 90.0) < 1e-9) // due east
    assert(math.abs(Orthogonalise.compassBearing(0, 0, -1, 0) - 180.0) < 1e-9)
    assert(math.abs(Orthogonalise.compassBearing(0, 0, 0, -1) - 270.0) < 1e-9)
  }

  test("segmentAngles classifies cardinal windows like the reference") {
    // square going E,N,W,S from origin
    val xs = IndexedSeq(0.0, 0.001, 0.001, 0.0, 0.0)
    val ys = IndexedSeq(0.0, 0.0, 0.001, 0.001, 0.0)
    val (org, cor, dir) = Orthogonalise.segmentAngles(xs, ys)
    assert(dir == Vector(1, 0, 3, 2))
    cor.foreach(c => assert(math.abs(c) < 1e-6))
    assert(org.length == 4)
  }
}
