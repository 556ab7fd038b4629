package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UDF-free column expressions over flat-segmentation polygon arrays
  * `[x1,y1,x2,y2,…]` (the COCO layout, reference coco.py:258). Everything is
  * built from higher-order functions so it stays inside whole-stage codegen.
  */
object GeomCols {

  private def xAt(seg: Column, i: Column): Column =
    element_at(seg, (i * 2 + 1).cast("int"))
  private def yAt(seg: Column, i: Column): Column =
    element_at(seg, (i * 2 + 2).cast("int"))

  /** Shoelace polygon area (reference `Polygon(...).area`, coco.py:259;
    * SURVEY.md P9) — `aggregate` cross-product sum over the vertex array. */
  def shoelaceCol(seg: Column): Column = {
    val n = (size(seg) / 2).cast("long")
    val signed = aggregate(
      sequence(lit(0L), n - 1),
      lit(0.0),
      (acc, i) => {
        val j = (i + 1) % n
        acc + (xAt(seg, i) * yAt(seg, j) - xAt(seg, j) * yAt(seg, i))
      })
    abs(signed) / 2.0
  }

  /** COCO bbox `[min_x, min_y, width, height]` from polygon bounds
    * (reference coco.py:221-241; SURVEY.md P8). */
  def bboxCol(seg: Column): Column = {
    val n = (size(seg) / 2).cast("long")
    def reduceBy(f: (Column, Column) => Column, pick: (Column, Column) => Column) =
      aggregate(sequence(lit(1L), n - 1), pick(seg, lit(0L)),
        (acc, i) => f(acc, pick(seg, i)))
    val minX = reduceBy(least(_, _), xAt)
    val minY = reduceBy(least(_, _), yAt)
    val maxX = reduceBy(greatest(_, _), xAt)
    val maxY = reduceBy(greatest(_, _), yAt)
    array(minX, minY, maxX - minX, maxY - minY)
  }

  /** Marginal-bbox predicate, replicated bug-for-bug from the reference
    * (coco.py:347-368; SURVEY.md P15 quirk): with margin>0 the flag fires
    * when the bbox does NOT hug the tile's outer band — which marks nearly
    * every annotation; with margin==0 the guard short-circuits to false. */
  def marginalCol(xMin: Column, yMin: Column, w: Column, h: Column,
                  tileW: Column, tileH: Column, marginPct: Column): Column = {
    val mW = tileW * marginPct / 100.0
    val mH = tileH * marginPct / 100.0
    val xMax = xMin + w
    val yMax = yMin + h
    (marginPct > 0) && (
      xMin < (tileW - mW) || xMax > (tileW + mW) ||
      yMin < (tileH - mH) || yMax > (tileH + mH))
  }
}
