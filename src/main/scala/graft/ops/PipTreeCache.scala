package graft.ops

import graft.geo.JtsGeo
import org.apache.spark.broadcast.Broadcast
import org.locationtech.jts.geom.{Coordinate, Point}
import org.locationtech.jts.geom.prep.PreparedGeometry

/** Executor-side cache of prepared polygon GRID indexes keyed by broadcast
  * id, with thread-confined probe state (JTS geometries and prepared
  * predicates are not thread-safe). Backing for
  * [[SpatialJoins.pointInPolygonBroadcastFast]].
  *
  * Round 6: the per-thread STRtree was replaced by a uniform GRID over
  * the layer's extent — a point probe is one bounds check + one cell
  * lookup + the cell's few candidates (envelope test, then prepared
  * covers), where the tree walked ~log-depth node envelopes per probe.
  * Grid resolution targets ~2 cells per polygon, so cell lists stay a
  * handful of entries for dim-table zone layers; a polygon is registered
  * in every cell its envelope touches, so the candidate set is a
  * superset of the tree's and `covers` filters identically — hit sets
  * are unchanged (SpatialJoinsSpec parity). Points outside the layer's
  * extent return the shared empty array without touching the index. */
object PipTreeCache {

  private val EMPTY = Array.empty[Long]

  /** one polygon entry: envelope bounds + prepared geometry */
  private final class Entry(val minX: Double, val minY: Double,
                            val maxX: Double, val maxY: Double,
                            val id: Long, val pg: PreparedGeometry)

  private final class Grid(entries: Array[Entry]) {
    val n = entries.length
    var minX, minY = Double.PositiveInfinity
    var maxX, maxY = Double.NegativeInfinity
    entries.foreach { e =>
      if (e.minX < minX) minX = e.minX
      if (e.minY < minY) minY = e.minY
      if (e.maxX > maxX) maxX = e.maxX
      if (e.maxY > maxY) maxY = e.maxY
    }
    // ~2 cells per polygon per axis-pair keeps cell lists short without
    // blowing up per-cell registration for layers of touching zones
    val dim: Int = math.max(1, math.min(1024,
      math.sqrt(2.0 * math.max(n, 1)).toInt))
    val invW: Double = if (maxX > minX) dim / (maxX - minX) else 0.0
    val invH: Double = if (maxY > minY) dim / (maxY - minY) else 0.0
    private def clamp(i: Int): Int = if (i < 0) 0 else if (i >= dim) dim - 1 else i
    def colOf(x: Double): Int = clamp((if (invW == 0) 0.0 else (x - minX) * invW).toInt)
    def rowOf(y: Double): Int = clamp((if (invH == 0) 0.0 else (y - minY) * invH).toInt)
    val cells: Array[Array[Entry]] = {
      val builders = Array.fill(dim * dim)(new scala.collection.mutable.ArrayBuffer[Entry](4))
      entries.foreach { e =>
        var c = colOf(e.minX)
        val c1 = colOf(e.maxX)
        while (c <= c1) {
          var r = rowOf(e.minY)
          val r1 = rowOf(e.maxY)
          while (r <= r1) { builders(r * dim + c) += e; r += 1 }
          c += 1
        }
      }
      builders.map(_.toArray)
    }
    def cellAt(x: Double, y: Double): Array[Entry] =
      cells(rowOf(y) * dim + colOf(x))
  }

  private final class ProbeState {
    val coord = new Coordinate(0, 0)
    val pt: Point = JtsGeo.factory.createPoint(coord)
    val out = new scala.collection.mutable.ArrayBuffer[Long](4)
  }

  private val state = ThreadLocal.withInitial[ProbeState](() => new ProbeState)

  /** Per-thread grids: prepared-geometry predicates take a synchronized
    * lazy-init path in JTS, so one shared index serializes 32 probing
    * threads behind a monitor (measured: flat scaling). An index per
    * thread has zero contention; its DRAM cost is controlled by the
    * *table layout* instead — Z-order-clustered inputs make consecutive
    * probes hit the same zones, so each thread's hot set is a handful of
    * polygons, not the whole layer. */
  private val threadGrids = ThreadLocal.withInitial[java.util.HashMap[Long, Grid]](
    () => new java.util.HashMap[Long, Grid]())

  private def gridFor(bcId: Long, bc: Broadcast[Array[(Long, Array[Byte])]]): Grid = {
    val local = threadGrids.get()
    var g = local.get(bcId)
    if (g == null) {
      g = new Grid(bc.value.map { case (id, wkb) =>
        val geom = JtsGeo.fromWkb(wkb)
        val e = geom.getEnvelopeInternal
        new Entry(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, id, JtsGeo.prepare(geom))
      })
      local.put(bcId, g)
    }
    g
  }

  def probe(bcId: Long, bc: Broadcast[Array[(Long, Array[Byte])]],
            x: Double, y: Double): Array[Long] = {
    val g = gridFor(bcId, bc)
    if (g.n == 0 || x < g.minX || x > g.maxX || y < g.minY || y > g.maxY) return EMPTY
    val s = state.get()
    s.coord.x = x; s.coord.y = y
    s.pt.geometryChanged()
    val cell = g.cellAt(x, y)
    var i = 0
    var m = 0
    s.out.clear()
    while (i < cell.length) {
      val e = cell(i)
      if (x >= e.minX && x <= e.maxX && y >= e.minY && y <= e.maxY &&
          e.pg.covers(s.pt)) { s.out += e.id; m += 1 }
      i += 1
    }
    if (m == 0) EMPTY else s.out.toArray
  }
}
