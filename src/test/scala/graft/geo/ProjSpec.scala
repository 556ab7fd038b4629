package graft.geo

import graft.{PropHelpers, SparkSpec}
import org.scalacheck.Gen

class ProjSpec extends SparkSpec with PropHelpers {

  test("mercator forward/inverse round trip") {
    forAll(Gen.choose(-179.0, 179.0), Gen.choose(-84.0, 84.0)) { (lon, lat) =>
      val x = Proj.mercatorX(lon); val y = Proj.mercatorY(lat)
      assert(math.abs(Proj.invMercatorLon(x) - lon) < 1e-9)
      assert(math.abs(Proj.invMercatorLat(y) - lat) < 1e-9)
    }
  }

  test("mercator matches known anchor values") {
    // equator/prime meridian and the web-mercator world corner
    assert(Proj.mercatorX(0) == 0.0 && math.abs(Proj.mercatorY(0)) < 1e-6)
    assert(math.abs(Proj.mercatorX(180) - 20037508.342789244) < 1e-6)
    assert(math.abs(Proj.mercatorY(85.0511287798066) - 20037508.34) < 1.0)
  }

  test("UTM forward matches closed-form anchors") {
    // on the central meridian: easting exactly 500 km, northing = K0 · arc
    val (e0, n0) = Proj.utmForward(0.0, -177.0, zone = 1, north = true)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // pole northing = K0 × quarter meridian (WGS84: 10001965.7293 m)
    val (_, nPole) = Proj.utmForward(90.0, -177.0, zone = 1, north = true)
    assert(math.abs(nPole - 0.9996 * 10001965.7293) < 0.01, s"pole $nPole")
    // southern hemisphere false northing
    val (_, nS) = Proj.utmForward(-0.0001, -177.0, zone = 1, north = false)
    assert(nS < 10000000.0 && nS > 9999980.0)
  }

  test("UTM forward/inverse round trip across zones and hemispheres") {
    forAll(Gen.choose(-70.0, 70.0), Gen.choose(-179.0, 179.0)) { (lat, lon) =>
      val (zone, north) = Proj.estimateUtmZone(lon, lat, lon, lat)
      val (e, n) = Proj.utmForward(lat, lon, zone, north)
      val (lat2, lon2) = Proj.utmInverse(e, n, zone, north)
      assert(math.abs(lat2 - lat) < 1e-7, s"lat $lat -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-7, s"lon $lon -> $lon2")
    }
  }

  test("estimateUtmZone reproduces the geopandas rule") {
    assert(Proj.estimateUtmZone(151.0, -33.0, 151.4, -33.9) == ((56, false)))
    assert(Proj.estimateUtmZone(-0.5, 51.0, 0.3, 51.8) == ((30, true))) // London straddle
    assert(Proj.estimateUtmZone(-180.0, 10.0, -180.0, 10.0)._1 == 1)
  }

  test("utmRingArea: 1km square near the equator has ~1e6 m2 area") {
    // ~0.009 degrees of lat ≈ 1 km
    val d = 0.0089932
    val ring = Seq(30.0, 0.0, 30.0 + d, 0.0, 30.0 + d, d, 30.0, d)
    val a = Proj.utmRingArea(ring)
    assert(math.abs(a - 1e6) / 1e6 < 0.01, s"area $a")
  }
}
