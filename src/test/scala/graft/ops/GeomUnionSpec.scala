package graft.ops

import graft.SparkSpec
import graft.geo.JtsGeo
import org.apache.spark.sql.functions._

class GeomUnionSpec extends SparkSpec {

  test("grouped union of same-height overlapping boxes has exact 1D-interval-union area") {
    val spark2 = spark
    import spark2.implicits._
    // group g: boxes [start, start+width] × [0, 10]; exact union area =
    // 10 × length of 1D interval union — computable in plain Scala
    val rows = for (g <- 0 until 8; i <- 0 until 50) yield {
      val start = ((g * 50 + i) * 7919L % 1000L).toDouble
      val w = (10 + (i * 37) % 90).toDouble
      (g.toLong, start, w, JtsGeo.toWkb(JtsGeo.box(start, 0, start + w, 10)))
    }
    val df = rows.toDF("g", "start", "w", "wkb")
    val got = df.groupBy("g").agg(GeomUnionAgg.union(col("wkb")).as("u"))
      .collect().map(r => r.getLong(0) -> JtsGeo.fromWkb(r.getAs[Array[Byte]](1)).getArea).toMap

    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val iv = rs.map(r => (r._2, r._2 + r._3)).sortBy(_._1)
      var total = 0.0; var curS = iv.head._1; var curE = iv.head._2
      iv.tail.foreach { case (s, e) =>
        if (s > curE) { total += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      total += curE - curS
      g -> total * 10.0
    }
    got.foreach { case (g, a) => assert(a == expect(g), s"group $g") }
  }

  test("union result is identical across partitionings (pinned merge order)") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 300).map { i =>
      val x = (i * 104729L % 5000L).toDouble; val y = (i * 7919L % 5000L).toDouble
      (1L, JtsGeo.toWkb(JtsGeo.box(x, y, x + 300, y + 300)))
    }
    def run(parts: Int) = rows.toDF("g", "wkb").repartition(parts)
      .groupBy("g").agg(GeomUnionAgg.union(col("wkb")).as("u"))
      .head.getAs[Array[Byte]](1)
    val a = JtsGeo.fromWkb(run(1)); val b = JtsGeo.fromWkb(run(7))
    assert(a.getArea == b.getArea)
    assert(a.equalsExact(b) || a.norm().equalsExact(b.norm()))
  }

  test("empty-geometry handling: null inputs would not occur; single geom passes through") {
    val spark2 = spark
    import spark2.implicits._
    val one = Seq((1L, JtsGeo.toWkb(JtsGeo.box(0, 0, 5, 5)))).toDF("g", "wkb")
    val u = JtsGeo.fromWkb(one.groupBy("g").agg(GeomUnionAgg.union(col("wkb")).as("u"))
      .head.getAs[Array[Byte]](1))
    assert(u.getArea == 25.0)
  }
}
