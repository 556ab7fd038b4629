package graft.ops

import graft.SparkSpec
import graft.geo.CellIndex
import graft.io.WebPages
import org.apache.spark.sql.functions._

class SpatialJoinsSpec extends SparkSpec {
  lazy val ci = CellIndex.Unit20

  lazy val pages = WebPages.pages(spark, 2000, 8)
  lazy val pts = WebPages.features(pages).select(col("id") * 10 + col("f") as "pid", col("x"), col("y"))
  lazy val zones = WebPages.zones(spark, 64)

  /** brute-force oracle: nested-loop PIP on collected rows */
  lazy val expected: Set[(Long, Long)] = {
    val ps = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val zs = zones.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    (for {
      (pid, x, y) <- ps
      (zid, x0, y0, x1, y1) <- zs
      if x0 <= x && x < x1 && y0 <= y && y < y1
    } yield (pid, zid)).toSet
  }

  test("pointInBox matches brute-force oracle at several levels") {
    for (level <- Seq(3, 5, 8)) {
      val got = SpatialJoins.pointInBox(pts, zones.drop("wkb"), ci, level)
        .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"level=$level")
    }
    assert(expected.nonEmpty)
  }

  test("pointInBox emits each qualifying pair exactly once (no dedup shuffle needed)") {
    val got = SpatialJoins.pointInBox(pts, zones.drop("wkb"), ci, 5)
      .groupBy("pid", "poly_id").count().where(col("count") > 1)
    assert(got.isEmpty)
  }

  test("pointInPolygon (partitioned JTS refine) matches oracle") {
    // JTS covers() is closed on the boundary; the arithmetic oracle is
    // half-open — integer-lattice points land on box edges with prob ~1e-5;
    // compare against a closed-predicate oracle instead.
    val ps = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val zs = zones.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val closed = (for {
      (pid, x, y) <- ps; (zid, x0, y0, x1, y1) <- zs
      if x0 <= x && x <= x1 && y0 <= y && y <= y1
    } yield (pid, zid)).toSet
    val got = SpatialJoins.pointInPolygon(pts, zones, ci, 5)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == closed)
  }

  test("pointInPolygonBroadcast matches the partitioned path") {
    val a = SpatialJoins.pointInPolygon(pts, zones, ci, 5)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SpatialJoins.pointInPolygonBroadcast(pts, zones)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("pointInPolygonBroadcastFast (codegen probe) matches the row path") {
    val a = SpatialJoins.pointInPolygonBroadcast(pts, zones)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SpatialJoins.pointInPolygonBroadcastFast(pts, zones)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && b.nonEmpty)
  }

  test("pointInBoxSalted output is identical to pointInBox under heavy skew") {
    val spark2 = spark
    import spark2.implicits._
    // point-mass skew: 3000 points in one cell + scattered rest
    val skewed = (0 until 3000).map(i => (i.toLong, 1000.0 + i % 50, 2000.0 + i % 40)) ++
      (0 until 200).map(i => (3000L + i, (i * 5237.0) % 1000000, (i * 7919.0) % 1000000))
    val pts2 = skewed.toDF("pid", "x", "y")
    val plain = SpatialJoins.pointInBox(pts2, zones.drop("wkb"), ci, 5)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SpatialJoins.pointInBoxSalted(pts2, zones.drop("wkb"), ci, 5,
      hotThreshold = 100, saltFactor = 8)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain && plain.nonEmpty)
    // and no duplicate emission
    val dup = SpatialJoins.pointInBoxSalted(pts2, zones.drop("wkb"), ci, 5, 100, 8)
      .groupBy("pid", "poly_id").count().where(col("count") > 1)
    assert(dup.isEmpty)
  }

  test("pointInBoxAdaptive output is identical to pointInBox under heavy skew") {
    val spark2 = spark
    import spark2.implicits._
    val skewed = (0 until 3000).map(i => (i.toLong, 1000.0 + i % 50, 2000.0 + i % 40)) ++
      (0 until 200).map(i => (3000L + i, (i * 5237.0) % 1000000, (i * 7919.0) % 1000000))
    val pts2 = skewed.toDF("pid", "x", "y")
    val plain = SpatialJoins.pointInBox(pts2, zones.drop("wkb"), ci, 5)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // active splitting (threshold below the point mass), two fine levels
    for (fine <- Seq(7, 9)) {
      val adaptive = SpatialJoins.pointInBoxAdaptive(pts2, zones.drop("wkb"), ci,
        level = 5, fineLevel = fine, hotThreshold = 100)
        .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(adaptive == plain && plain.nonEmpty, s"fine=$fine")
    }
    // no duplicate emission even when a box spans hot AND cold base cells
    val dup = SpatialJoins.pointInBoxAdaptive(pts2, zones.drop("wkb"), ci, 5, 7, 100)
      .groupBy("pid", "poly_id").count().where(col("count") > 1)
    assert(dup.isEmpty)
    // inactive splitting (threshold above everything) also matches
    val inactive = SpatialJoins.pointInBoxAdaptive(pts2, zones.drop("wkb"), ci, 5, 7,
      hotThreshold = 100000)
      .select("pid", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inactive == plain)
  }

  test("envelopeJoin matches brute-force intersects, one row per pair") {
    val left = zones.select(col("poly_id").as("lid"), col("xmin").as("lxmin"),
      col("ymin").as("lymin"), col("xmax").as("lxmax"), col("ymax").as("lymax"))
    val right = zones.select(col("poly_id").as("rid"), col("xmin").as("rxmin"),
      col("ymin").as("rymin"), col("xmax").as("rxmax"), col("ymax").as("rymax"))
    val got = SpatialJoins.envelopeJoin(left, right, ci, 5)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val zs = zones.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val expect = (for {
      (a, ax0, ay0, ax1, ay1) <- zs; (b, bx0, by0, bx1, by1) <- zs
      if ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
    } yield (a, b)).toSet
    assert(got.length == got.toSet.size, "duplicate pair emission")
    assert(got.toSet == expect)
  }
}
