package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hierarchical quadkey cell index (H3/S2-style, from scratch — no external
  * geo-index jar exists in this sandbox).
  *
  * A square world `[originX, originX+size) × [originY, originY+size)` is cut
  * into a `2^level × 2^level` grid; a cell id packs the zoom level and the
  * Morton (Z-order) bit-interleave of (col, row) into one non-negative Long:
  *
  * {{{ cellId = (level << 58) | interleave(col, row) }}}
  *
  * Levels 0..28 (28 bits per axis → 56 interleaved bits < 58). Z-order keeps
  * spatially-near cells numerically near, so range scans / partition pruning
  * over `cellId` behave like a coarse spatial index — this is the engine's
  * analog of the reference's fixed tile grid + `tile_{col}-{row}` naming
  * (reference: tiles.py:52-54,122-124) lifted to a resolution hierarchy.
  *
  * Everything exists in three synchronized forms:
  *   - pure-Scala (`encode`, `cellsCovering`, `ring`) for kernels and tests;
  *   - Spark `Column` builders (`colOf`/`encodeCol`/…) that compile to
  *     codegen-friendly built-in expressions (shiftleft/and/or — no UDF);
  *   - ANSI-SQL string emitters (`*Sql`) for the DuckDB correctness oracle.
  * A spec cross-checks all three on random inputs.
  */
final case class CellIndex(originX: Double, originY: Double, size: Double) {

  import CellIndex._

  // ---------- pure Scala ----------

  /** Finest supported zoom (28 bits per axis — see class doc). */
  val maxLevel: Int = 28

  def cellSize(level: Int): Double = size / (1L << level).toDouble

  def colOf(x: Double, level: Int): Long =
    clamp(math.floor((x - originX) / cellSize(level)).toLong, level)

  def rowOf(y: Double, level: Int): Long =
    clamp(math.floor((y - originY) / cellSize(level)).toLong, level)

  def encode(x: Double, y: Double, level: Int): Long =
    pack(level, colOf(x, level), rowOf(y, level))

  /** All cells at `level` whose box intersects the closed envelope. */
  def cellsCovering(xmin: Double, ymin: Double, xmax: Double, ymax: Double, level: Int): Seq[Long] = {
    val (c0, c1) = (colOf(xmin, level), colOf(xmax, level))
    val (r0, r1) = (rowOf(ymin, level), rowOf(ymax, level))
    for (c <- c0 to c1; r <- r0 to r1) yield pack(level, c, r)
  }

  /** Cell ids at Chebyshev distance exactly `k` (k=0 → the cell itself),
    * clamped at world borders. Generalizes the reference's ±1 tile
    * neighbourhood (tiles.py:241-249) to arbitrary ring radius for kNN. */
  def ring(cell: Long, k: Int): Seq[Long] = {
    val lvl = levelOf(cell); val n = 1L << lvl
    val (c, r) = (colDecode(cell), rowDecode(cell))
    if (k == 0) Seq(cell)
    else {
      val out = Seq.newBuilder[Long]
      for (dc <- -k to k; dr <- -k to k) {
        if (math.max(math.abs(dc), math.abs(dr)) == k) {
          val (nc, nr) = (c + dc, r + dr)
          if (nc >= 0 && nc < n && nr >= 0 && nr < n) out += pack(lvl, nc, nr)
        }
      }
      out.result()
    }
  }

  /** Cells at Chebyshev distance ≤ k (the closed disk). */
  def disk(cell: Long, k: Int): Seq[Long] = (0 to k).flatMap(ring(cell, _))

  private def clamp(v: Long, level: Int): Long =
    math.min(math.max(v, 0L), (1L << level) - 1L)

  // ---------- Spark Column builders (codegen-friendly, UDF-free) ----------

  def colOfCol(x: Column, level: Int): Column =
    clampCol(floor((x - lit(originX)) / lit(cellSize(level))).cast("long"), level)

  def rowOfCol(y: Column, level: Int): Column =
    clampCol(floor((y - lit(originY)) / lit(cellSize(level))).cast("long"), level)

  def encodeCol(x: Column, y: Column, level: Int): Column =
    packCol(level, colOfCol(x, level), rowOfCol(y, level))

  /** Array column of covering cell ids for an envelope (explode downstream). */
  def cellsCoveringCol(xmin: Column, ymin: Column, xmax: Column, ymax: Column, level: Int): Column = {
    val (c0, c1) = (colOfCol(xmin, level), colOfCol(xmax, level))
    val (r0, r1) = (rowOfCol(ymin, level), rowOfCol(ymax, level))
    flatten(transform(sequence(c0, c1), c =>
      transform(sequence(r0, r1), r => packCol(level, c, r))))
  }

  private def clampCol(v: Column, level: Int): Column =
    greatest(lit(0L), least(v, lit((1L << level) - 1L)))
}

object CellIndex {

  /** Web-Mercator world (EPSG:3857 square extent) — the default geo world. */
  val WebMercator: CellIndex = {
    val half = 20037508.342789244
    CellIndex(-half, -half, 2 * half)
  }

  /** Integer unit world [0, 2^20)² used by the oracle-checked queries:
    * all coordinates stay integral so Spark and DuckDB agree bit-for-bit. */
  val Unit20: CellIndex = CellIndex(0.0, 0.0, 1048576.0)

  private val M0 = 0x0000FFFF0000FFFFL
  private val M1 = 0x00FF00FF00FF00FFL
  private val M2 = 0x0F0F0F0F0F0F0F0FL
  private val M3 = 0x3333333333333333L
  private val M4 = 0x5555555555555555L

  // ---------- pure Scala codec ----------

  /** Spread the low 28 bits of v to even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0x0FFFFFFFL
    x = (x | (x << 16)) & M0
    x = (x | (x << 8)) & M1
    x = (x | (x << 4)) & M2
    x = (x | (x << 2)) & M3
    x = (x | (x << 1)) & M4
    x
  }

  /** Inverse of spread: gather even bit positions back to the low 28 bits. */
  def gather(v: Long): Long = {
    var x = v & M4
    x = (x | (x >> 1)) & M3
    x = (x | (x >> 2)) & M2
    x = (x | (x >> 4)) & M1
    x = (x | (x >> 8)) & M0
    x = (x | (x >> 16)) & 0x0FFFFFFFL
    x
  }

  def interleave(col: Long, row: Long): Long = spread(col) | (spread(row) << 1)

  def pack(level: Int, col: Long, row: Long): Long =
    (level.toLong << 58) | interleave(col, row)

  def levelOf(cell: Long): Int = ((cell >> 58) & 0x1FL).toInt
  def colDecode(cell: Long): Long = gather(cell & MORTON_MASK)
  def rowDecode(cell: Long): Long = gather((cell & MORTON_MASK) >> 1)
  private val MORTON_MASK = (1L << 58) - 1L

  def parent(cell: Long): Long = {
    val lvl = levelOf(cell)
    require(lvl > 0, s"level-0 cell has no parent: $cell")
    pack(lvl - 1, colDecode(cell) >> 1, rowDecode(cell) >> 1)
  }

  def children(cell: Long): Seq[Long] = {
    val lvl = levelOf(cell)
    val (c, r) = (colDecode(cell) << 1, rowDecode(cell) << 1)
    for (dc <- 0 to 1; dr <- 0 to 1) yield pack(lvl + 1, c + dc, r + dr)
  }

  // ---------- Spark Column codec ----------

  def spreadCol(v: Column): Column = {
    var x = v.bitwiseAND(lit(0x0FFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(M0))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(M1))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(M2))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(M3))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(M4))
  }

  def packCol(level: Int, col: Column, row: Column): Column =
    lit(level.toLong << 58)
      .bitwiseOR(spreadCol(col))
      .bitwiseOR(shiftleft(spreadCol(row), 1))

  // ---------- ANSI-SQL emitters (for the DuckDB oracle) ----------

  /** SQL expression spreading the low 28 bits of `v` to even positions.
    * Must stay algebraically identical to [[spread]]. */
  def spreadSql(v: String): String = {
    def step(e: String, sh: Int, m: Long) = s"((($e)|(($e)<<$sh))&$m)"
    var e = s"(($v)&${0x0FFFFFFFL})"
    e = step(e, 16, M0); e = step(e, 8, M1); e = step(e, 4, M2)
    e = step(e, 2, M3); e = step(e, 1, M4)
    e
  }

  def packSql(level: Int, col: String, row: String): String =
    s"((${level.toLong << 58})|(${spreadSql(col)})|((${spreadSql(row)})<<1))"
}
