package graft.ops

import graft.model.{RasterMeta, TileMeta}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Tile-grid generation replicating reference `tiles.py:16-83` exactly,
  * including its quirks:
  *  - `map_units`: both tile dims are divided by the **x** pixel size and
  *    rounded half-up (`int(w/cell_x + 0.5)`, tiles.py:39-48) — requires an
  *    axis-aligned transform (b == d == 0) or raises;
  *  - offset overlap: `offset_w = int(tw·off/100)` (truncating), first
  *    row/col gets a single-sided pad, interior tiles double (tiles.py:57-79,
  *    the in-loop `tile_width` mutation included);
  *  - windows clamp to the raster (`intersection(big_window)`);
  *  - tile name `tile_{colOff}-{rowOff}` (tiles.py:122-124), and the tile
  *    affine is the parent composed with the window translation.
  *
  * Pure per-raster function + a distributed wrapper (one raster's grid is
  * small metadata; at fleet scale the Dataset of rasters fans out).
  */
object Tiling {

  def tilesFor(r: RasterMeta, tileWidth: Int, tileHeight: Int,
               mapUnits: Boolean = false, offsetPct: Double = 0.0): Seq[TileMeta] = {
    var (tw, th) = (tileWidth, tileHeight)
    if (mapUnits) {
      require(r.b == 0 && r.d == 0, "Coefficient a from raster.transform.a is not width.")
      // reference divides BOTH dims by cell_x (tiles.py:42-45)
      tw = (tileWidth / r.a + 0.5).toInt
      th = (tileHeight / r.a + 0.5).toInt
    }
    val (ncols, nrows) = (r.width, r.height)
    val offW = (tw * offsetPct / 100).toInt
    val offH = (th * offsetPct / 100).toInt
    val TW = math.min(tw + offW * 2, ncols)
    val TH = math.min(th + offH * 2, nrows)

    for {
      colCorner <- 0 until ncols by tw
      rowCorner <- 0 until nrows by th
    } yield {
      val w0 = if (colCorner == 0) math.min(TW + offW, ncols) else math.min(TW + offW * 2, ncols)
      val h0 = if (rowCorner == 0) math.min(TH + offH, nrows) else math.min(TH + offH * 2, nrows)
      val colOff = math.max(0, colCorner - offW)
      val rowOff = math.max(0, rowCorner - offH)
      val width = math.min(colOff + w0, ncols) - colOff
      val height = math.min(rowOff + h0, nrows) - rowOff
      TileMeta(r.rasterId, s"tile_$colOff-$rowOff", colOff, rowOff, width, height,
        a = r.a, b = r.b, c = r.c + r.a * colOff + r.b * rowOff,
        d = r.d, e = r.e, f = r.f + r.d * colOff + r.e * rowOff)
    }
  }

  /** Distributed grid over a fleet of rasters. */
  def tileGrid(rasters: Dataset[RasterMeta], tileWidth: Int, tileHeight: Int,
               mapUnits: Boolean = false, offsetPct: Double = 0.0): Dataset[TileMeta] = {
    val spark = rasters.sparkSession
    import spark.implicits._
    rasters.flatMap(tilesFor(_, tileWidth, tileHeight, mapUnits, offsetPct))
  }

  /** World-space envelope of a tile (min/max over the 4 window corners —
    * valid for any affine, not just north-up). */
  def worldEnvelope(t: TileMeta): (Double, Double, Double, Double) = {
    val corners = Seq((0, 0), (t.width, 0), (0, t.height), (t.width, t.height))
      .map { case (cc, rr) => (t.c + t.a * cc + t.b * rr, t.f + t.d * cc + t.e * rr) }
    (corners.map(_._1).min, corners.map(_._2).min,
      corners.map(_._1).max, corners.map(_._2).max)
  }
}
