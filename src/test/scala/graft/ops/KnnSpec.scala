package graft.ops

import graft.SparkSpec
import graft.geo.CellIndex
import graft.io.WebPages
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  lazy val ci = CellIndex.Unit20

  def bruteKnn(ps: Array[(Long, Double, Double)], k: Int): Set[(Long, Int, Long)] =
    ps.flatMap { case (q, qx, qy) =>
      ps.filter(_._1 != q)
        .map { case (p, px, py) => (p, (qx - px) * (qx - px) + (qy - py) * (qy - py)) }
        .sortBy { case (p, d) => (d, p) }
        .take(k).zipWithIndex
        .map { case ((p, _), i) => (q, i + 1, p) }
    }.toSet

  test("knnJoin is exact vs brute force at multiple levels (sparse and dense grids)") {
    val pts = WebPages.features(WebPages.pages(spark, 300, 4))
      .select((col("id") * 10 + col("f")).as("pid"), col("x"), col("y"))
    val ps = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expect = bruteKnn(ps, 3)
    for (level <- Seq(2, 4, 6)) {
      val q = pts.select(col("pid").as("qid"), col("x"), col("y"))
      val got = Knn.knnJoin(q, pts, 3, ci, level)
        .select("qid", "rank", "pid").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expect, s"level=$level")
    }
  }

  test("knnJoin with k larger than candidate pool returns all others, exhaustively") {
    val spark2 = spark
    import spark2.implicits._
    val tiny = Seq((1L, 10.0, 10.0), (2L, 20.0, 10.0), (3L, 500000.0, 500000.0))
      .toDF("pid", "x", "y")
    val got = Knn.knnJoin(tiny.select(col("pid").as("qid"), col("x"), col("y")), tiny, 5, ci, 10)
    assert(got.count() == 6) // each of 3 queries finds the other 2
  }

  test("many sparse stragglers stay exact via grid coarsening (guarded cross join never fires)") {
    val spark2 = spark
    import spark2.implicits._
    // 300 points scattered over the world at a far-too-fine fixed level:
    // rings stay empty for rounds, maxRounds trips with ~300 stragglers,
    // and the guard (maxExhaustQueries=10 << 300) must take the coarsening
    // path — the old behavior was an unconditional 300×|points| cross join
    val pts = (0 until 300).map { i =>
      (i.toLong, (i * 2654435761L % 1048576L).toDouble,
        (i * 1256953L % 1048576L).toDouble)
    }.toDF("pid", "x", "y")
    val ps = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expect = bruteKnn(ps, 3)
    val got = Knn.knnJoin(pts.select(col("pid").as("qid"), col("x"), col("y")),
        pts, 3, ci, level = 16, maxRounds = 3, maxExhaustQueries = 10)
      .select("qid", "rank", "pid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect)
  }
}
