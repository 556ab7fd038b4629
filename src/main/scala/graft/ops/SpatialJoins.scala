package graft.ops

import graft.geo.{CellIndex, JtsGeo}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.prep.PreparedGeometry
import org.locationtech.jts.index.strtree.STRtree

import scala.jdk.CollectionConverters._

/** Cell-grid spatial joins (SURVEY.md §2.3 J1/J7, §4.1-2).
  *
  * Catalyst plans a theta predicate like `contains(poly, point)` as an
  * O(n·m) BroadcastNestedLoopJoin, so every spatial join here is decomposed
  * into an **equi-join on cell id** that Catalyst shuffles/broadcasts like
  * any other key join, followed by an exact refine step:
  *
  * {{{ points ⋈ polys  ≡  encode(point) = explode(cellsCovering(env(poly))) , then refine }}}
  *
  * The point side carries exactly one cell and the polygon side is exploded
  * over its covering cells, so each qualifying pair appears exactly once —
  * no post-join dedup (and no extra shuffle for it).
  *
  * Refine paths:
  *  - pure-arithmetic for boxes (whole-stage codegen, zero JTS),
  *  - per-partition JTS with prepared-geometry cache for real polygons,
  *  - broadcast STRtree (`pointInPolygonBroadcast`) when the polygon side
  *    fits on one executor — the "broadcast-or-partitioned" pair the
  *    north_star names.
  */
object SpatialJoins {

  /** Point-in-box join, arithmetic refine (half-open: min ≤ p < max).
    * `points` must have (`x`,`y`) columns; `boxes` (`xmin`,`ymin`,`xmax`,`ymax`).
    * With `broadcastBoxes` the exploded cover side is broadcast — the point
    * side is then never shuffled at all (explode inflates the box side past
    * Catalyst's auto-broadcast estimate, so the hint is explicit). Use when
    * the zone layer is dim-table-sized; leave false for layer×layer joins. */
  def pointInBox(points: DataFrame, boxes: DataFrame, ci: CellIndex, level: Int,
                 broadcastBoxes: Boolean = false): DataFrame = {
    val p = points.withColumn("_cell", ci.encodeCol(col("x"), col("y"), level))
    val b0 = boxes.withColumn("_cell",
      explode(ci.cellsCoveringCol(col("xmin"), col("ymin"), col("xmax"), col("ymax"), level)))
    val b = if (broadcastBoxes) broadcast(b0) else b0
    p.join(b, "_cell")
      .where(col("xmin") <= col("x") && col("x") < col("xmax") &&
             col("ymin") <= col("y") && col("y") < col("ymax"))
      .drop("_cell")
  }

  /** Point-in-polygon with partitioned refine. `polys` carries
    * (`poly_id`:long, `wkb`:binary, `xmin`,`ymin`,`xmax`,`ymax`). Output:
    * point columns + `poly_id`. The equi-join shuffles both sides by cell;
    * refine parses each polygon once per task (keyed cache of prepared
    * geometries) — the partitioned arm for when neither side broadcasts. */
  def pointInPolygon(points: DataFrame, polys: DataFrame, ci: CellIndex, level: Int): DataFrame = {
    val p = points.withColumn("_cell", ci.encodeCol(col("x"), col("y"), level))
    val b = polys
      .withColumn("_cell",
        explode(ci.cellsCoveringCol(col("xmin"), col("ymin"), col("xmax"), col("ymax"), level)))
      .select(col("_cell"), col("poly_id"), col("wkb"))
    val joined = p.join(b, "_cell").drop("_cell")

    val outSchema = StructType(joined.schema.filterNot(f => f.name == "wkb"))
    val xI = joined.schema.fieldIndex("x"); val yI = joined.schema.fieldIndex("y")
    val wI = joined.schema.fieldIndex("wkb"); val idI = joined.schema.fieldIndex("poly_id")
    val keep = joined.schema.indices.filterNot(_ == wI)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    joined.mapPartitions { it =>
      val cache = new java.util.HashMap[Long, PreparedGeometry]()
      it.filter { r =>
        val pg = cache.computeIfAbsent(r.getLong(idI),
          _ => JtsGeo.prepare(JtsGeo.fromWkb(r.getAs[Array[Byte]](wI))))
        pg.covers(JtsGeo.point(r.getDouble(xI), r.getDouble(yI)))
      }.map(r => Row.fromSeq(keep.map(r.get)))
    }
  }

  /** Point-in-polygon with the polygon side broadcast and an STRtree probed
    * per partition — no shuffle of the point side at all. Preferred when the
    * polygon layer is a dim-table (tile layers, zone layers).
    *
    * Hot-loop discipline (this is the 100 TB fast path): the probe point and
    * its envelope are reused across rows (`geometryChanged()` resets cached
    * envelopes), tree hits go through an `ItemVisitor` (no per-row ArrayList),
    * and output rows are built from positional arrays — per-row garbage is
    * a single small array, which is what lets 32 allocating threads scale. */
  def pointInPolygonBroadcast(points: DataFrame, polys: DataFrame): DataFrame = {
    val spark = points.sparkSession
    val polyRows = polys.select("poly_id", "wkb").collect()
    val bc = spark.sparkContext.broadcast(polyRows.map(r =>
      (r.getLong(0), r.getAs[Array[Byte]](1))))

    val outSchema = points.schema.add("poly_id", LongType, nullable = false)
    val n = points.schema.length
    val xI = points.schema.fieldIndex("x"); val yI = points.schema.fieldIndex("y")
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    points.mapPartitions { it =>
      val tree = new STRtree()
      bc.value.foreach { case (id, wkb) =>
        val g = JtsGeo.fromWkb(wkb)
        tree.insert(g.getEnvelopeInternal, (id, JtsGeo.prepare(g)))
      }
      if (bc.value.nonEmpty) tree.build()
      val coord = new org.locationtech.jts.geom.Coordinate(0, 0)
      val pt = JtsGeo.factory.createPoint(coord)
      val env = new org.locationtech.jts.geom.Envelope()
      val hits = new java.util.ArrayList[Long](4)
      val visitor = new org.locationtech.jts.index.ItemVisitor {
        override def visitItem(item: AnyRef): Unit = {
          val (id, pg) = item.asInstanceOf[(Long, PreparedGeometry)]
          if (pg.covers(pt)) hits.add(id)
        }
      }
      it.flatMap { r =>
        coord.x = r.getDouble(xI); coord.y = r.getDouble(yI)
        pt.geometryChanged()
        env.init(coord.x, coord.x, coord.y, coord.y)
        hits.clear()
        tree.query(env, visitor)
        if (hits.isEmpty) Iterator.empty
        else {
          // materialize eagerly: `hits` and the upstream row are reused
          // buffers — deferred access would read the next row's state
          val m = hits.size
          val out = new Array[Row](m)
          var k = 0
          while (k < m) {
            val arr = new Array[Any](n + 1)
            var i = 0
            while (i < n) { arr(i) = r.get(i); i += 1 }
            arr(n) = hits.get(k)
            out(k) = Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
            k += 1
          }
          out.iterator
        }
      }
    }
  }

  /** Fast-path broadcast PIP: a primitive-arg function probes a
    * per-executor cached STRtree and returns the matching poly ids; the
    * surrounding plan (scan → explode → aggregate) stays in whole-stage
    * codegen, so per-row garbage is one small array on hit and a shared
    * empty array on miss — ~3× less allocation churn than the
    * `mapPartitions` row-codec path, which is what the 100 TB scan feeds.
    * Output: point columns + `poly_id`. */
  def pointInPolygonBroadcastFast(points: DataFrame, polys: DataFrame): DataFrame = {
    val spark = points.sparkSession
    val polyRows = polys.select("poly_id", "wkb").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val bc = spark.sparkContext.broadcast(polyRows)
    // native expression (round 6): primitive-double args straight from the
    // columnar scan into the probe — the previous ScalaUDF boxed both
    // coordinates and converter-copied the result array per scanned row
    points.withColumn("poly_id",
      explode(graft.functions.PipExprs.pipProbe(col("x"), col("y"), bc.id, bc)))
  }

  /** Skew-aware point-in-box (north_rule "salted repartitioning + adaptive
    * cell splitting"): a cheap stats pass finds hot cells (> `hotThreshold`
    * points); points in hot cells get a salt from their coordinates, and the
    * box side replicates its cover rows `salt`-ways for hot cells only —
    * identical output to [[pointInBox]] (verified in the spec), but a
    * point-mass cell now spreads over `saltFactor` reducers instead of one.
    * Residual equi-join skew is additionally covered by AQE's skew-join. */
  def pointInBoxSalted(points: DataFrame, boxes: DataFrame, ci: CellIndex, level: Int,
                       hotThreshold: Long = 2000000L, saltFactor: Int = 16): DataFrame = {
    val p0 = points.withColumn("_cell", ci.encodeCol(col("x"), col("y"), level))
    val hot = p0.groupBy("_cell").count().where(col("count") > hotThreshold)
      .select(col("_cell"), lit(true).as("_hot"))
    val p = p0.join(broadcast(hot), Seq("_cell"), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull,
          pmod(hash(col("x"), col("y")), lit(saltFactor))).otherwise(lit(0)))
      .drop("_hot")
    val b0 = boxes.withColumn("_cell",
      explode(ci.cellsCoveringCol(col("xmin"), col("ymin"), col("xmax"), col("ymax"), level)))
    val b = b0.join(broadcast(hot), Seq("_cell"), "left")
      .withColumn("_salt", explode(
        when(col("_hot").isNotNull, sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("_hot")
    p.join(b, Seq("_cell", "_salt"))
      .where(col("xmin") <= col("x") && col("x") < col("xmax") &&
             col("ymin") <= col("y") && col("y") < col("ymax"))
      .drop("_cell", "_salt")
  }

  /** Adaptive cell splitting (north_rule's second skew tool, complementing
    * [[pointInBoxSalted]]): a cheap stats pass finds hot base-level cells;
    * points inside them re-key at `fineLevel` (G12 hierarchy children) while
    * everything else keeps the base key, and the box side subdivides its
    * cover — only for hot cells — into the fine cells intersecting
    * box ∩ baseCell. Identical output to [[pointInBox]] (spec-verified):
    * every (point, box) pair meets on exactly one key — fine when the
    * point's base cell is hot (the box emits that fine cell exactly once,
    * clamped inside the base cell), base otherwise. A point-mass cell thus
    * spreads over up to 4^(fineLevel−level) reducers, and unlike salting
    * the box side replicates only over subcells it actually intersects. */
  def pointInBoxAdaptive(points: DataFrame, boxes: DataFrame, ci: CellIndex,
                         level: Int, fineLevel: Int,
                         hotThreshold: Long = 2000000L): DataFrame = {
    require(fineLevel > level, "fineLevel must subdivide level")
    val k = 1L << (fineLevel - level)
    val p0 = points.withColumn("_c0", ci.encodeCol(col("x"), col("y"), level))
    val hot = p0.groupBy("_c0").count().where(col("count") > hotThreshold)
      .select(col("_c0"), lit(true).as("_hot"))
    val p = p0.join(broadcast(hot), Seq("_c0"), "left")
      .withColumn("_cell", when(col("_hot").isNotNull,
        ci.encodeCol(col("x"), col("y"), fineLevel)).otherwise(col("_c0")))
      .drop("_c0", "_hot")
    val b0 = boxes
      .withColumn("_bc", explode(sequence(
        ci.colOfCol(col("xmin"), level), ci.colOfCol(col("xmax"), level))))
      .withColumn("_br", explode(sequence(
        ci.rowOfCol(col("ymin"), level), ci.rowOfCol(col("ymax"), level))))
      .withColumn("_c0", CellIndex.packCol(level, col("_bc"), col("_br")))
    // fine columns/rows of the box cover clamped INSIDE this base cell —
    // spilling into a neighbour's subcells would double-emit pairs there
    val fc0 = greatest(ci.colOfCol(col("xmin"), fineLevel), col("_bc") * k)
    val fc1 = least(ci.colOfCol(col("xmax"), fineLevel), (col("_bc") + 1) * k - 1)
    val fr0 = greatest(ci.rowOfCol(col("ymin"), fineLevel), col("_br") * k)
    val fr1 = least(ci.rowOfCol(col("ymax"), fineLevel), (col("_br") + 1) * k - 1)
    val b = b0.join(broadcast(hot), Seq("_c0"), "left")
      .withColumn("_cell", explode(when(col("_hot").isNotNull,
          flatten(transform(sequence(fc0, fc1), c =>
            transform(sequence(fr0, fr1), r => CellIndex.packCol(fineLevel, c, r)))))
        .otherwise(array(col("_c0")))))
      .drop("_c0", "_bc", "_br", "_hot")
    p.join(b, Seq("_cell"))
      .where(col("xmin") <= col("x") && col("x") < col("xmax") &&
             col("ymin") <= col("y") && col("y") < col("ymax"))
      .drop("_cell")
  }

  /** Envelope-intersects range join (reference J7, batch_geojson2coco.py:118)
    * via the same cell decomposition. Both sides carry envelopes; the left
    * side's cover is exploded, the right side joins on its own cover — pairs
    * dedup on the *smallest common cell* trick: a pair is emitted only from
    * the cell containing the left envelope's min corner if that cell is in
    * the right cover, else kept distinct. Simpler and still single-emission:
    * emit from the cell of max(leftMin, rightMin) corner. */
  def envelopeJoin(left: DataFrame, right: DataFrame, ci: CellIndex, level: Int): DataFrame = {
    val l = left.withColumn("_cell",
      explode(ci.cellsCoveringCol(col("lxmin"), col("lymin"), col("lxmax"), col("lymax"), level)))
    val r = right.withColumn("_cell",
      explode(ci.cellsCoveringCol(col("rxmin"), col("rymin"), col("rxmax"), col("rymax"), level)))
    l.join(r, "_cell")
      .where(col("lxmin") <= col("rxmax") && col("rxmin") <= col("lxmax") &&
             col("lymin") <= col("rymax") && col("rymin") <= col("lymax"))
      // single-emission guard: keep the pair only in the cell that contains
      // the intersection's min corner — every intersecting pair has exactly
      // one such cell, so no distinct() shuffle is needed.
      .where(col("_cell") === ci.encodeCol(
        greatest(col("lxmin"), col("rxmin")), greatest(col("lymin"), col("rymin")), level))
      .drop("_cell")
  }
}
