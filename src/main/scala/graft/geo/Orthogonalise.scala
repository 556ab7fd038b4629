package graft.geo

import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}

/** JOSM-style polygon orthogonalisation — faithful Scala reimplementation of
  * the reference's hardest kernel (aerial_conversion/orthogonalise/
  * orthogonalise.py:38-354; SURVEY.md G3-G5), preserving its exact control
  * flow: per-ring validity repair → segment compass bearings vs cardinal
  * directions (with the previous-segment window-shift quirk) → rotation by
  * the median deviation (or 45° when stdev ≥ 30) about the EPSG:3857
  * centroid → start-index shift for wrap-around straight runs → 180°-turn
  * direction repair → per-run coordinate averaging with skew tolerance →
  * reverse shift → rotate back → ring reassembly.
  *
  * Coordinates are WGS84 lon/lat like the reference (it reprojects to 4326
  * before calling this — scripts/coco2geojson.py:342-351).
  */
object Orthogonalise {

  /** Great-circle initial bearing, degrees [0, 360) —
    * orthogonalise.py:38-78 (points are (lat, lon)). */
  def compassBearing(latA: Double, lonA: Double, latB: Double, lonB: Double): Double = {
    val lat1 = math.toRadians(latA)
    val lat2 = math.toRadians(latB)
    val dLon = math.toRadians(lonB - lonA)
    val x = math.sin(dLon) * math.cos(lat2)
    val y = math.cos(lat1) * math.sin(lat2) - math.sin(lat1) * math.cos(lat2) * math.cos(dLon)
    (math.toDegrees(math.atan2(x, y)) + 360) % 360
  }

  /** Segment angles vs cardinal directions — orthogonalise.py:81-149.
    * Returns (orgAngle, corAngle, dirAngle[0..3 = N,E,S,W]).
    * `maxAngleChange` is the PARAMETER form (45 → no window shift). */
  def segmentAngles(xs: IndexedSeq[Double], ys: IndexedSeq[Double],
                    maxAngleChange: Double = 45)
      : (Vector[Double], Vector[Double], Vector[Int]) = {
    val shiftMag = 45 - maxAngleChange
    var limit = Array(0.0, 0.0, 0.0, 0.0)
    val org = Vector.newBuilder[Double]
    val cor = Vector.newBuilder[Double]
    val dir = Vector.newBuilder[Int]
    var lastDir = 0
    for (i <- 0 until xs.length - 1) {
      val angle = compassBearing(ys(i), xs(i), ys(i + 1), xs(i + 1))
      var d = -1
      if (angle > (45 + limit(1)) && angle <= (135 - limit(1))) {
        org += angle; cor += angle - 90; d = 1
      } else if (angle > (135 + limit(2)) && angle <= (225 - limit(2))) {
        org += angle; cor += angle - 180; d = 2
      } else if (angle > (225 + limit(3)) && angle <= (315 - limit(3))) {
        org += angle; cor += angle - 270; d = 3
      } else if (angle > (315 + limit(0)) && angle <= 360) {
        org += angle; cor += angle - 360; d = 0
      } else if (angle >= 0 && angle <= (45 - limit(0))) {
        org += angle; cor += angle; d = 0
      }
      if (d >= 0) { dir += d; lastDir = d }
      // reference updates the windows from the segment just classified
      limit = Array(0.0, 0.0, 0.0, 0.0)
      limit(lastDir) = shiftMag
      limit((lastDir + 1) % 4) = -shiftMag
      limit(((lastDir - 1) % 4 + 4) % 4) = -shiftMag
    }
    (org.result(), cor.result(), dir.result())
  }

  /** Rotate about the EPSG:3857 centroid by `angle` degrees CCW, in and out
    * of 4326 — orthogonalise.py:152-178. */
  def rotatePolygon(ring: Polygon, angle: Double): Polygon = {
    val merc = ring.getCoordinates.map(c =>
      new Coordinate(Proj.mercatorX(c.x), Proj.mercatorY(c.y)))
    val mercPoly = JtsGeo.factory.createPolygon(merc)
    val ctr = org.locationtech.jts.algorithm.Centroid.getCentroid(mercPoly)
    val rad = math.toRadians(angle)
    val (cosA, sinA) = (math.cos(rad), math.sin(rad))
    val rotated = merc.map { c =>
      val dx = c.x - ctr.x; val dy = c.y - ctr.y
      new Coordinate(
        Proj.invMercatorLon(ctr.x + dx * cosA - dy * sinA),
        Proj.invMercatorLat(ctr.y + dx * sinA + dy * cosA))
    }
    JtsGeo.factory.createPolygon(rotated)
  }

  private def median(v: Seq[Double]): Double = {
    val s = v.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def sampleStdev(v: Seq[Double]): Double = {
    val n = v.length
    val m = v.sum / n
    math.sqrt(v.map(x => (x - m) * (x - m)).sum / (n - 1))
  }

  /** One ring — orthogonalise.py:214-345 main loop body. */
  def orthogonaliseRing(ring0: Polygon, maxAngleChange: Double,
                        skewTolerance: Double): Polygon = {
    // validity repair cascade (orthogonalise.py:219-231)
    var ring = ring0
    if (!ring.isValid) ring = asPolygon(ring.buffer(0))
    if (!ring.isValid) ring = asPolygon(ring.buffer(1e-7))
    if (!ring.isValid) ring = asPolygon(JtsGeo.makeValid(ring))

    val xs0 = ring.getExteriorRing.getCoordinates.map(_.x).toIndexedSeq
    val ys0 = ring.getExteriorRing.getCoordinates.map(_.y).toIndexedSeq

    val (_, cor0, _) = segmentAngles(xs0, ys0)
    val medAngle =
      if (cor0.length >= 2 && sampleStdev(cor0) < 30) median(cor0)
      else 45.0 // ~45° buildings: can't pick a rotation sign (py:239-241)

    val rotated = rotatePolygon(ring, medAngle)
    var (orgA, _, dirA) = segmentAngles(
      rotated.getExteriorRing.getCoordinates.map(_.x).toIndexedSeq,
      rotated.getExteriorRing.getCoordinates.map(_.y).toIndexedSeq,
      maxAngleChange)
    var rx = rotated.getExteriorRing.getCoordinates.map(_.x).toBuffer
    var ry = rotated.getExteriorRing.getCoordinates.map(_.y).toBuffer

    // start-index shift for wrap-around straight runs (py:256-269)
    var shift = 0
    var i = 1
    var broke = false
    while (i < dirA.length && !broke) {
      if (dirA(0) == dirA(dirA.length - i)) { shift = i; i += 1 } else broke = true
    }
    if (shift != 0) {
      def rot[T](v: Vector[T]) = v.takeRight(shift) ++ v.dropRight(shift)
      dirA = rot(dirA); orgA = rot(orgA)
      val nrx = rx.slice(rx.length - shift - 1, rx.length - 1) ++ rx.dropRight(shift)
      val nry = ry.slice(ry.length - shift - 1, ry.length - 1) ++ ry.dropRight(shift)
      rx = nrx; ry = nry
    }

    // 180°-turn repair (py:271-277); python dir[i-1] wraps to the last
    // element at i=0 — preserved
    val roll = dirA.drop(1) :+ dirA(0)
    dirA = Vector.tabulate(dirA.length) { i =>
      if (math.abs(dirA(i) - roll(i)) == 2)
        dirA(if (i == 0) dirA.length - 1 else i - 1)
      else dirA(i)
    }

    // per-run coordinate averaging (py:279-329)
    val dirs = dirA :+ dirA(0)
    val orgs = orgA :+ orgA(0)
    var buf = List.empty[Int]
    def skewed(a: Double): Boolean = {
      val m = ((a % 90) + 90) % 90
      m > (45 - skewTolerance) && m < (45 + skewTolerance)
    }
    for (i <- 0 until dirs.length - 1) {
      if (!skewed(orgs(i))) {
        buf = buf :+ i
        val continueRun = dirs(i) == dirs(i + 1) && !skewed(orgs(i + 1))
        if (!continueRun) {
          val lo = buf.head; val hi = buf.last + 1 // inclusive point range
          if (dirs(i) == 0 || dirs(i) == 2) {
            val m = (lo to hi).map(rx).sum / (hi - lo + 1)
            (lo to hi).foreach(k => rx(k) = m)
          } else {
            val m = (lo to hi).map(ry).sum / (hi - lo + 1)
            (lo to hi).foreach(k => ry(k) = m)
          }
          if (buf.contains(0)) { rx(rx.length - 1) = rx(0); ry(ry.length - 1) = ry(0) }
          buf = List.empty
        }
      }
    }

    // reverse shift (py:331-339)
    if (shift != 0) {
      val nrx = rx.drop(shift) ++ rx.slice(1, shift + 1)
      val nry = ry.drop(shift) ++ ry.slice(1, shift + 1)
      rx = nrx; ry = nry
    } else {
      rx(0) = rx(rx.length - 1); ry(0) = ry(ry.length - 1)
    }

    val coords = rx.zip(ry).map { case (x, y) => new Coordinate(x, y) }.toArray
    rotatePolygon(JtsGeo.factory.createPolygon(closed(coords)), -medAngle)
  }

  /** Whole polygon incl. holes — orthogonalise.py:208-212, 347-353. */
  def apply(polygon: Polygon, maxAngleChange: Double = 15,
            skewTolerance: Double = 15): Polygon = {
    val rings: Seq[Polygon] =
      JtsGeo.factory.createPolygon(polygon.getExteriorRing.getCoordinates) +:
        (0 until polygon.getNumInteriorRing).map(i =>
          JtsGeo.factory.createPolygon(polygon.getInteriorRingN(i).getCoordinates))
    val done = rings.map(orthogonaliseRing(_, maxAngleChange, skewTolerance))
    JtsGeo.factory.createPolygon(
      JtsGeo.factory.createLinearRing(done.head.getExteriorRing.getCoordinates),
      done.tail.map(p =>
        JtsGeo.factory.createLinearRing(p.getExteriorRing.getCoordinates)).toArray)
  }

  private def closed(cs: Array[Coordinate]): Array[Coordinate] =
    if (cs.nonEmpty && !cs.head.equals2D(cs.last)) cs :+ cs.head.copy() else cs

  private def asPolygon(g: Geometry): Polygon = g match {
    case p: Polygon => p
    case other =>
      // make_valid can yield a collection; keep the largest polygon part
      val parts = JtsGeo.explodePolygons(other)
      if (parts.isEmpty) JtsGeo.factory.createPolygon()
      else parts.maxBy(_.getArea)
  }
}
