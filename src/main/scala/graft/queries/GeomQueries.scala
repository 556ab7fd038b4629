package graft.queries

import graft.geo.{JtsGeo, Orthogonalise}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Coordinate

/** JTS-kernel queries whose outputs stay oracle-checkable: the per-group
  * geometry-union area reduces to an exact 1D interval union (same-height
  * boxes), and orthogonalise asserts its right-angle postcondition as a
  * boolean the oracle expects to be uniformly true. */
object GeomQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2/G10: distributed geometry union — area matches the DuckDB
    // gaps-and-islands 1D interval union exactly (integer coordinates)
    "q33_union" -> ((s, dir) => {
      import s.implicits._
      val boxes = t(s, dir, "documents").select(
        (col("doc_id") % 20).as("g"),
        (col("doc_id") * 7919 % 1000).cast("double").as("x0"),
        (col("doc_id") * 37 % 90 + 10).cast("double").as("w"))
        .map { r =>
          (r.getLong(0),
            JtsGeo.toWkb(JtsGeo.box(r.getDouble(1), 0, r.getDouble(1) + r.getDouble(2), 10)))
        }.toDF("g", "wkb")
      boxes.groupBy("g").agg(graft.ops.GeomUnionAgg.union(col("wkb")).as("u"))
        .map { r => (r.getLong(0), JtsGeo.fromWkb(r.getAs[Array[Byte]](1)).getArea) }
        .toDF("g", "area")
        .orderBy("g")
    }),

    // G3: orthogonalise postcondition — every jittered near-rectangle comes
    // out right-angled (planar corner deviation < 1.5°) with area > 0
    "q34_ortho" -> ((s, dir) => {
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("right_angled", BooleanType)))
      implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
      t(s, dir, "documents").select("doc_id").mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val base = 0.001
          def j(k: Long) = (((id * 31 + k) * 2654435761L) % 41L - 20L) * 1e-6
          val lon = (id % 300).toDouble * 0.5 - 75
          val poly = JtsGeo.factory.createPolygon(Array(
            new Coordinate(lon + j(0), 0.001 + j(1)),
            new Coordinate(lon + base + j(2), 0.001 + j(3)),
            new Coordinate(lon + base + j(4), 0.001 + base + j(5)),
            new Coordinate(lon + j(6), 0.001 + base + j(7)),
            new Coordinate(lon + j(0), 0.001 + j(1))))
          val o = Orthogonalise(poly)
          val cs = o.getExteriorRing.getCoordinates.dropRight(1)
          val ok = o.isValid && o.getArea > 0 && cs.indices.forall { i =>
            val a = cs((i - 1 + cs.length) % cs.length); val b = cs(i); val c = cs((i + 1) % cs.length)
            var d = math.toDegrees(
              math.atan2(c.y - b.y, c.x - b.x) - math.atan2(a.y - b.y, a.x - b.x))
            while (d < 0) d += 360
            math.min(math.abs(d - 90), math.abs(d - 270)) < 1.5
          }
          Row(id, ok)
        }
      }.orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q33_union" ->
      """WITH b AS (SELECT doc_id%20 AS g, (doc_id*7919)%1000 AS s,
             (doc_id*7919)%1000 + (doc_id*37)%90 + 10 AS e FROM documents),
         m AS (SELECT g, s, e, CASE WHEN s > max(e) OVER (PARTITION BY g
             ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS brk FROM b),
         i AS (SELECT g, s, e, sum(brk) OVER (PARTITION BY g ORDER BY s, e)
             AS grp FROM m),
         isl AS (SELECT g, grp, max(e) - min(s) AS len FROM i GROUP BY g, grp)
         SELECT g, CAST(10*sum(len) AS DOUBLE) AS area FROM isl
         GROUP BY g ORDER BY g""",
    "q34_ortho" ->
      "SELECT doc_id, TRUE AS right_angled FROM documents ORDER BY doc_id"
  )
}
