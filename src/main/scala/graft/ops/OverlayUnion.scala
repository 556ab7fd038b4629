package graft.ops

import graft.geo.JtsGeo
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Geometry, GeometryCollection, Polygon}

import scala.collection.mutable.ArrayBuffer

/** SURVEY.md §2 A3 — the reference's deprecated incremental overlay-union
  * merge (`merge_class_polygons_geopandas`, scripts/coco2geojson.py:41-101).
  *
  * Semantics, faithfully: per class/zone group the rows are visited IN
  * ORDER holding a running piece set R; the first row is copied; a
  * subsequent `marginal` row p replaces R with the geopandas
  * `overlay(R, p, how="union")` result — every `g ∩ p` (R's row order),
  * then every `g − p` (R's row order), then `p − ∪R` — while a
  * non-marginal row is concatenated unsplit (coco2geojson.py:79-93; the
  * concat arm can and does leave overlapping rows, reproduced as-is).
  * A multi-part difference stays ONE row (geopandas keeps a MultiPolygon
  * per input row), so the result is NOT simply the arrangement of the
  * inputs in general. `keepGeomType=true` mirrors geopandas'
  * keep_geom_type: only the polygonal component of each piece survives
  * (touching boxes shed their shared-edge LineString).
  *
  * Scale shape: the fold is inherently sequential WITHIN a group — that is
  * the reference's semantics, not an implementation shortcut — so the
  * engine distributes ACROSS groups: hash-repartition on the group key,
  * secondary sort on (group, seq), one streaming fold per group inside
  * `mapPartitions`. Group count = zones/classes (small, bounded); no
  * driver collect, no shuffle beyond the one repartition. A2
  * (`GeomUnionAgg`) remains the non-deprecated merge path.
  */
object OverlayUnion {

  /** rows: (groupCol: long, seqCol: orderable, wkbCol: binary,
    * marginalCol: boolean) → (g, piece_seq, piece) with piece_seq the
    * final running-set row order the reference would hold. */
  def incrementalOverlayUnion(
      rows: DataFrame,
      groupCol: String,
      seqCol: String,
      wkbCol: String,
      marginalCol: String,
      keepGeomType: Boolean = true): DataFrame = {
    val spark = rows.sparkSession
    val in = rows.select(
      col(groupCol).cast(LongType).as("g"),
      col(seqCol).cast(LongType).as("seq"),
      col(wkbCol).as("wkb"),
      col(marginalCol).as("marginal"))
    val sorted = in.repartition(col("g")).sortWithinPartitions("g", "seq")
    val outSchema = StructType(Seq(
      StructField("g", LongType, nullable = false),
      StructField("piece_seq", IntegerType, nullable = false),
      StructField("piece", BinaryType, nullable = false)))
    val outRows = sorted.rdd.mapPartitions { it =>
      // consecutive rows with equal g form one group (sorted within partition)
      val rowsIt = it.map { r =>
        (r.getLong(0), r.getAs[Array[Byte]](2), r.getBoolean(3))
      }
      new Iterator[Row] {
        private val in = rowsIt.buffered
        private var out: Iterator[Row] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && in.hasNext) {
            val g = in.head._1
            val group = ArrayBuffer.empty[(Array[Byte], Boolean)]
            while (in.hasNext && in.head._1 == g)
              group += { val r = in.next(); (r._2, r._3) }
            val pieces = foldGroup(group.toSeq, keepGeomType)
            out = pieces.iterator.zipWithIndex.map { case (p, i) =>
              Row(g, i, JtsGeo.toWkb(p))
            }
          }
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): Row = { advance(); out.next() }
      }
    }
    spark.createDataFrame(outRows, outSchema)
  }

  /** One group's sequential fold (reference row loop at
    * coco2geojson.py:68-93). Pieces whose envelope misses the incoming
    * polygon contribute no intersection row and pass through the
    * difference unchanged — semantics-identical, and it keeps the
    * quadratic JTS work confined to pieces that actually touch p (on
    * mostly-local inputs the scan is O(pieces) envelope checks per row).
    * The p−∪R remainder is peeled piece-by-piece (difference association
    * instead of union-then-difference — equal on valid inputs; exact
    * float parity of this deprecated path is pinned by the
    * integer-coordinate q48 fixture). */
  private[ops] def foldGroup(
      group: Seq[(Array[Byte], Boolean)],
      keepGeomType: Boolean): Vector[Geometry] = {
    var r = Vector.empty[Geometry]
    group.foreach { case (wkb, marginal) =>
      val p = JtsGeo.fromWkb(wkb)
      if (r.isEmpty) r = Vector(p) // reference i == 0: copied regardless
      else if (marginal) {
        val pEnv = p.getEnvelopeInternal
        val inter = Vector.newBuilder[Geometry]
        val diff1 = Vector.newBuilder[Geometry]
        var rest: Geometry = p
        r.foreach { g =>
          if (g.getEnvelopeInternal.intersects(pEnv)) {
            inter += keep(g.intersection(p), keepGeomType)
            diff1 += keep(g.difference(p), keepGeomType)
            if (!rest.isEmpty) rest = rest.difference(g)
          } else diff1 += g // disjoint: g ∩ p = ∅, g − p = g
        }
        val diff2 = keep(rest, keepGeomType)
        r = (inter.result() ++ diff1.result() ++ Vector(diff2))
          .filter(g => g != null && !g.isEmpty)
      } else r = r :+ p
    }
    r
  }

  /** geopandas keep_geom_type: retain only the polygonal component of a
    * mixed overlay result (shared edges / corner touches drop out). */
  private def keep(g: Geometry, keepGeomType: Boolean): Geometry =
    if (!keepGeomType || g == null || g.isEmpty) g
    else g match {
      case _: Polygon => g
      case _: org.locationtech.jts.geom.MultiPolygon => g
      case gc: GeometryCollection =>
        val polys = (0 until gc.getNumGeometries)
          .map(gc.getGeometryN)
          .collect { case p: Polygon => p }
        if (polys.isEmpty) JtsGeo.factory.createPolygon()
        else if (polys.size == 1) polys.head
        else g.getFactory.createMultiPolygon(polys.toArray)
      case _ => JtsGeo.factory.createPolygon()
    }
}
