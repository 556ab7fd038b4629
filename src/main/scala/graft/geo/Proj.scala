package graft.geo

/** From-scratch projection math for the CRS pairs the reference actually
  * uses (SURVEY.md P7; no proj4 jar exists in the sandbox):
  *  - EPSG:4326 ↔ EPSG:3857 closed-form spherical Mercator
  *    (reference hops for simplify/orthogonalise, coco2geojson.py:342-353);
  *  - EPSG:4326 ↔ UTM via Transverse Mercator Krüger series
  *    (reference area filter, coordinates.py:194-198);
  *  - `estimateUtmZone` reproducing geopandas `estimate_utm_crs`: zone from
  *    the layer bounds' centroid (coordinates.py:195).
  * Pure double math — usable inside kernels and as column expressions.
  */
object Proj {

  val R = 6378137.0 // WGS84 semi-major
  val F = 1.0 / 298.257223563
  val E2 = F * (2 - F) // first eccentricity²
  val K0 = 0.9996 // UTM scale

  // ---------- spherical Mercator (EPSG:3857) ----------

  def mercatorX(lon: Double): Double = R * math.toRadians(lon)
  def mercatorY(lat: Double): Double =
    R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
  def invMercatorLon(x: Double): Double = math.toDegrees(x / R)
  def invMercatorLat(y: Double): Double =
    math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)

  // ---------- UTM (Transverse Mercator, series to n^4) ----------

  /** Geographic (degree-unit) CRS detection by FAMILY, not one literal
    * code: a layer declared EPSG:4269 (NAD83), 4267 (NAD27), 4258 (ETRS89),
    * 4283 (GDA94), 4759 (NAD83 NSRS2007), OGC:CRS84, or with a GEOGCS/
    * GEOGCRS WKT body is in degrees exactly like EPSG:4326 and needs the
    * same UTM-projected area measurement (coordinates.py:194-198 calls
    * `estimate_utm_crs` for ANY geographic layer, not just 4326). */
  def isGeographic(crs: String): Boolean = {
    val c = crs.trim.toUpperCase
    val geographicEpsg =
      Set("4326", "4269", "4267", "4258", "4283", "4490", "4617", "4759")
    c == "CRS84" || c == "OGC:CRS84" || c == "WGS84" ||
      c.startsWith("GEOGCS") || c.startsWith("GEOGCRS") ||
      geographicEpsg.exists(code => c == s"EPSG:$code")
  }

  /** geopandas estimate_utm_crs rule: zone of the bounds centroid. */
  def estimateUtmZone(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double): (Int, Boolean) = {
    val lon = (lonMin + lonMax) / 2; val lat = (latMin + latMax) / 2
    (((lon + 180) / 6).toInt % 60 + 1, lat >= 0)
  }

  private val n = F / (2 - F)
  private val A = R / (1 + n) * (1 + n * n / 4 + n * n * n * n / 64)
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n * n + 5.0 / 16 * n * n * n,
    13.0 / 48 * n * n - 3.0 / 5 * n * n * n,
    61.0 / 240 * n * n * n)

  /** Forward TM: (lat, lon) degrees → (easting, northing) meters for the
    * given zone/hemisphere (standard Karney/Krüger series, ~1e-5 m). */
  def utmForward(lat: Double, lon: Double, zone: Int, north: Boolean): (Double, Double) = {
    val lon0 = math.toRadians(zone * 6 - 183)
    val phi = math.toRadians(lat)
    val dl = math.toRadians(lon) - lon0
    val t = math.sinh(atanh(math.sin(phi)) - math.sqrt(E2) * atanh(math.sqrt(E2) * math.sin(phi)))
    val xiP = math.atan2(t, math.cos(dl))
    val etaP = atanh(math.sin(dl) / math.sqrt(1 + t * t))
    var xi = xiP; var eta = etaP
    for (j <- 1 to 3) {
      xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
    }
    val e = K0 * A * eta + 500000.0
    val nn = K0 * A * xi + (if (north) 0.0 else 10000000.0)
    (e, nn)
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  private val beta = Array(
    n / 2 - 2.0 / 3 * n * n + 37.0 / 96 * n * n * n,
    n * n / 48 + n * n * n / 15,
    17.0 / 480 * n * n * n)

  /** Inverse TM: (easting, northing) → (lat, lon) degrees (Karney series). */
  def utmInverse(e: Double, nn: Double, zone: Int, north: Boolean): (Double, Double) = {
    val lon0 = math.toRadians(zone * 6 - 183)
    val xi0 = (nn - (if (north) 0.0 else 10000000.0)) / (K0 * A)
    val eta0 = (e - 500000.0) / (K0 * A)
    var xi = xi0; var eta = eta0
    for (j <- 1 to 3) {
      xi -= beta(j - 1) * math.sin(2 * j * xi0) * math.cosh(2 * j * eta0)
      eta -= beta(j - 1) * math.cos(2 * j * xi0) * math.sinh(2 * j * eta0)
    }
    val chi = math.asin(math.sin(xi) / math.cosh(eta))
    // latitude from conformal latitude: solve tau(phi) = tan(chi) by
    // bisection (robust, ~1e-12 rad after 60 halvings)
    val target = math.tan(chi)
    var lo = -math.Pi / 2 + 1e-12; var hi = math.Pi / 2 - 1e-12
    for (_ <- 0 until 60) {
      val mid = (lo + hi) / 2
      val t = math.sinh(atanh(math.sin(mid)) - math.sqrt(E2) * atanh(math.sqrt(E2) * math.sin(mid)))
      if (t < target) lo = mid else hi = mid
    }
    val phi = (lo + hi) / 2
    val lon = lon0 + math.atan2(math.sinh(eta), math.cos(xi))
    (math.toDegrees(phi), math.toDegrees(lon))
  }

  /** UTM-projected area of a lon/lat polygon (shell − holes) for a FIXED
    * zone — the reference estimates one UTM CRS for the whole layer
    * (`geojson.estimate_utm_crs()`, coordinates.py:195) and filters every
    * clipped part by its area in that CRS (coordinates.py:194-198). */
  def utmPolygonArea(poly: org.locationtech.jts.geom.Polygon, zone: Int, north: Boolean): Double = {
    def ringArea(ring: org.locationtech.jts.geom.LineString): Double = {
      val cs = ring.getCoordinates
      if (cs.length < 4) return 0.0
      val pts = cs.map(c => utmForward(c.y, c.x, zone, north))
      var s = 0.0
      for (i <- 0 until pts.length - 1) {
        s += pts(i)._1 * pts(i + 1)._2 - pts(i + 1)._1 * pts(i)._2
      }
      math.abs(s) / 2
    }
    val holes = (0 until poly.getNumInteriorRing)
      .map(i => ringArea(poly.getInteriorRingN(i))).sum
    ringArea(poly.getExteriorRing) - holes
  }

  /** Shoelace area of a lat/lon ring after projecting to its estimated UTM —
    * the reference's area-filter semantics (coordinates.py:194-198). */
  def utmRingArea(latLonFlat: Seq[Double]): Double = {
    if (latLonFlat.length < 6) return 0.0
    val lons = latLonFlat.grouped(2).map(_.head).toSeq
    val lats = latLonFlat.grouped(2).map(_.last).toSeq
    val (zone, north) = estimateUtmZone(lons.min, lats.min, lons.max, lats.max)
    val pts = lons.zip(lats).map { case (lo, la) => utmForward(la, lo, zone, north) }
    var s = 0.0
    for (i <- pts.indices) {
      val j = (i + 1) % pts.length
      s += pts(i)._1 * pts(j)._2 - pts(j)._1 * pts(i)._2
    }
    math.abs(s) / 2
  }
}
