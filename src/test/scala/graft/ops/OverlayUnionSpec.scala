package graft.ops

import graft.SparkSpec
import graft.geo.JtsGeo
import org.locationtech.jts.geom.Geometry

import scala.util.Random

/** A3 — incremental overlay union (reference scripts/coco2geojson.py:41-101).
  * The fold is checked against an independent 1D interval model that
  * replays the geopandas overlay(how="union") row semantics: each running
  * row is a SET of disjoint intervals (a multi-part difference stays one
  * row), a marginal row splits every running row into (row ∩ p) and
  * (row − p) and appends (p − coverage), a non-marginal row is appended
  * unsplit. Same-height boxes make the 2D operator 1D-equivalent. */
class OverlayUnionSpec extends SparkSpec {

  private type Iv = (Double, Double)
  private type Piece = Vector[Iv] // one overlay row = disjoint intervals

  private def ivIntersect(a: Piece, lo: Double, hi: Double): Piece =
    a.flatMap { case (s, e) =>
      val l = math.max(s, lo); val h = math.min(e, hi)
      if (l < h) Some((l, h)) else None
    }

  private def ivDifference(a: Piece, lo: Double, hi: Double): Piece =
    a.flatMap { case (s, e) =>
      val out = Vector.newBuilder[Iv]
      if (s < math.min(e, lo)) out += ((s, math.min(e, lo)))
      if (math.max(s, hi) < e) out += ((math.max(s, hi), e))
      out.result()
    }

  /** model fold over intervals: rows are (lo, hi, marginal) */
  private def modelFold(rows: Seq[(Double, Double, Boolean)]): Vector[Piece] = {
    var r = Vector.empty[Piece]
    rows.foreach { case (lo, hi, marginal) =>
      val p: Piece = Vector((lo, hi))
      if (r.isEmpty) r = Vector(p)
      else if (marginal) {
        val inter = r.map(ivIntersect(_, lo, hi))
        val diff1 = r.map { g =>
          // row − p : clip each component against [lo,hi)
          g.flatMap(c => ivDifference(Vector(c), lo, hi))
        }
        val covered = r.flatten.sortBy(_._1)
        var rest: Piece = p
        covered.foreach { case (s, e) => rest = ivDifference(rest, s, e) }
        r = (inter ++ diff1 :+ rest).filter(_.nonEmpty)
      } else r = r :+ p
    }
    r
  }

  private def boxes(rows: Seq[(Double, Double, Boolean)]): Seq[(Array[Byte], Boolean)] =
    rows.map { case (lo, hi, m) => (JtsGeo.toWkb(JtsGeo.box(lo, 0, hi, 10)), m) }

  /** geometry → sorted x-interval components (same-height boxes only) */
  private def asPiece(g: Geometry): Piece =
    JtsGeo.explodePolygons(g).map { p =>
      val env = p.getEnvelopeInternal; (env.getMinX, env.getMaxX)
    }.sortBy(_._1).toVector

  private def check(rows: Seq[(Double, Double, Boolean)]): Unit = {
    val got = OverlayUnion.foldGroup(boxes(rows), keepGeomType = true).map(asPiece)
    val want = modelFold(rows).map(_.sortBy(_._1))
    assert(got.size === want.size, s"row count for $rows")
    got.zip(want).foreach { case (g, w) =>
      assert(g.size === w.size, s"component count for $rows")
      g.zip(w).foreach { case ((gs, ge), (ws, we)) =>
        gs shouldBe ws +- 1e-9
        ge shouldBe we +- 1e-9
      }
    }
  }

  test("fold matches the interval model on directed cases") {
    // sweep (the q48 fixture shape)
    check((0 until 6).map(i => (10.0 * i, 10.0 * i + 17, true)))
    // identical rows collapse to one piece
    check(Seq((0.0, 10.0, true), (0.0, 10.0, true)))
    // containment: inner split
    check(Seq((0.0, 10.0, true), (2.0, 8.0, true), (0.0, 10.0, true)))
    // disjoint then bridging (multi-part difference stays ONE row)
    check(Seq((0.0, 10.0, true), (20.0, 30.0, true), (5.0, 25.0, true)))
    // spill on both sides of coverage → MultiPolygon difference row
    check(Seq((5.0, 10.0, true), (0.0, 20.0, true)))
  }

  test("multi-part difference is one MultiPolygon row, not two rows") {
    val out = OverlayUnion.foldGroup(
      boxes(Seq((5.0, 10.0, true), (0.0, 20.0, true))), keepGeomType = true)
    // rows: [5,10) ∩ = [5,10); [5,10) − = ∅; p − R = [0,5) ∪ [10,20)
    out should have size 2
    out.map(_.getNumGeometries).sorted shouldBe Vector(1, 2)
  }

  test("non-marginal rows concat unsplit and may overlap (reference quirk)") {
    val out = OverlayUnion.foldGroup(
      boxes(Seq((0.0, 10.0, false), (0.0, 10.0, false), (0.0, 10.0, false))),
      keepGeomType = true)
    out should have size 3
    out.foreach(g => g.getArea shouldBe 100.0 +- 1e-9)
  }

  test("keepGeomType drops the shared-edge line of touching boxes") {
    val touching = boxes(Seq((0.0, 10.0, true), (10.0, 20.0, true)))
    val kept = OverlayUnion.foldGroup(touching, keepGeomType = true)
    kept should have size 2 // empty polygon intersection filtered
    val raw = OverlayUnion.foldGroup(touching, keepGeomType = false)
    raw should have size 3 // LineString intersection survives
    raw.count(_.getDimension == 1) shouldBe 1
  }

  test("fold matches the model on random marginal/concat sequences") {
    val rnd = new Random(42)
    (0 until 30).foreach { _ =>
      val n = 2 + rnd.nextInt(6)
      val rows = (0 until n).map { _ =>
        val lo = rnd.nextInt(40).toDouble
        val hi = lo + 1 + rnd.nextInt(20)
        // mostly marginal; occasional concat rows that we keep disjoint
        // from nothing in particular — the model handles overlap too
        (lo, hi, rnd.nextInt(4) > 0)
      }
      check(rows)
    }
  }

  test("distributed path equals the local fold per group") {
    import spark.implicits._
    val rnd = new Random(7)
    val data = (0 until 6).flatMap { g =>
      (0 until 8).map { i =>
        val lo = rnd.nextInt(50).toDouble
        val hi = lo + 1 + rnd.nextInt(25)
        (g.toLong, i.toLong, JtsGeo.toWkb(JtsGeo.box(lo, 0, hi, 10)), rnd.nextBoolean())
      }
    }
    val df = data.toDF("g", "seq", "wkb", "marginal").repartition(5)
    val got = OverlayUnion
      .incrementalOverlayUnion(df, "g", "seq", "wkb", "marginal")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(r => asPiece(JtsGeo.fromWkb(r.getAs[Array[Byte]](2)))).toVector
      }
    data.groupBy(_._1).foreach { case (g, rows) =>
      val local = OverlayUnion
        .foldGroup(rows.sortBy(_._2).map(r => (r._3, r._4)), keepGeomType = true)
        .map(asPiece)
      got(g) shouldBe local
    }
  }
}
