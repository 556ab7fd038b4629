package graft.ops

import graft.geo.CellIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact k-nearest-neighbour join by iterative cell-ring expansion —
  * the generalization of the reference's fixed ±1 tile neighbourhood
  * (reference tiles.py:180-256, which is O(tiles²); SURVEY.md J8).
  *
  * Round r examines the Chebyshev disk of radius r around each query's
  * cell (an equi-join on cell id — no cross join ever materializes).
  * A query is settled once its k-th candidate distance is strictly
  * below `r · cellSize`: every unexamined point lies ≥ that far away,
  * so it cannot enter the top-k even on ties. Unsettled queries carry
  * to the next round with doubled radius — at web scale the first round
  * settles almost everything because `level` is chosen from point
  * density so the expected points-per-cell ≳ k.
  *
  * Hygiene: every round-local cache (`ranked`, the carried `remaining`)
  * is unpersisted as soon as its successor is materialized — storage is
  * bounded by one round regardless of round count; rounds are capped
  * (radius doubling reaches exhaustion in ≤ ~6 rounds anyway).
  *
  * Deterministic ordering: (dist2 asc, pid asc) — ties never depend on
  * partitioning.
  */
object Knn {

  /** Grid level with expected points/cell ≈ max(k, 4): cells = 4^level.
    * Too fine a grid (fixed high level) makes round 1 miss and multiplies
    * driver rounds; too coarse explodes per-cell candidate lists. */
  def levelForDensity(nPoints: Long, k: Int, ci: CellIndex): Int = {
    val targetPerCell = math.max(k, 4).toDouble
    val cells = math.max(nPoints / targetPerCell, 1.0)
    val lvl = (math.log(cells) / math.log(4.0)).toInt
    math.max(0, math.min(ci.maxLevel, lvl))
  }

  /** queries: (`qid`,`x`,`y`); points: (`pid`,`x`,`y`). Output:
    * (`qid`, `rank` 1..k, `pid`, `dist2`). Self-pairs (qid==pid) are
    * excluded when `excludeSelf`. `level` < 0 picks the grid level from
    * point density (expected points/cell ≈ k). */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int,
              ci: CellIndex, level: Int = -1, excludeSelf: Boolean = true,
              maxRounds: Int = 8): DataFrame = {
    val pts0 = points
      .select(col("pid"), col("x").as("px"), col("y").as("py"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPts = pts0.count()
    val lvl = if (level >= 0) level else levelForDensity(nPts, k, ci)
    val cs = ci.cellSize(lvl)
    val n = 1L << lvl

    val pts = pts0
      .withColumn("pcell", CellIndex.packCol(lvl,
        ci.colOfCol(col("px"), lvl), ci.rowOfCol(col("py"), lvl)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pts.count()
    pts0.unpersist(false)

    var remaining = queries
      .select(col("qid"), col("x").as("qx"), col("y").as("qy"),
        ci.colOfCol(col("x"), lvl).as("qc"), ci.rowOfCol(col("y"), lvl).as("qr"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var results: DataFrame = null
    val roundCaches = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var r = 1L
    var round = 0
    var done = false
    while (!done) {
      round += 1
      // Once the disk would explode too many cells per query, the stragglers
      // are isolated points in sparse space — switch to an exhaustive join
      // (exact by exhaustion) instead of growing the explode O(r²).
      val worldCovered = r >= n || (2 * r + 1) * (2 * r + 1) >= 4096 ||
        round >= maxRounds
      val base =
        if (worldCovered) remaining.join(pts)
        else remaining
          .withColumn("_cell", explode(flatten(transform(
            sequence(greatest(col("qc") - r, lit(0L)), least(col("qc") + r, lit(n - 1))),
            c => transform(
              sequence(greatest(col("qr") - r, lit(0L)), least(col("qr") + r, lit(n - 1))),
              rr => CellIndex.packCol(lvl, c, rr))))))
          .join(pts, col("_cell") === col("pcell"))
      val cand = base
        .where(if (excludeSelf) col("qid") =!= col("pid") else lit(true))
        .withColumn("dist2",
          (col("qx") - col("px")) * (col("qx") - col("px")) +
          (col("qy") - col("py")) * (col("qy") - col("py")))
      val w = Window.partitionBy("qid").orderBy(col("dist2").asc, col("pid").asc)
      val ranked = cand
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .groupBy("qid")
        .agg(max(when(col("rank") === k, col("dist2"))).as("kth"),
          collect_list(struct(col("rank"), col("pid"), col("dist2"))).as("topk"))
        .withColumn("settled",
          lit(worldCovered) || (col("kth").isNotNull && col("kth") < lit(r * cs) * lit(r * cs)))
        .persist(StorageLevel.MEMORY_AND_DISK)

      val settledRows = ranked.where(col("settled"))
        .select(col("qid"), explode(col("topk")).as("t"))
        .select(col("qid"), col("t.rank"), col("t.pid"), col("t.dist2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      settledRows.count() // materialize before the inputs below it are dropped
      roundCaches += settledRows
      results = if (results == null) settledRows else results.unionByName(settledRows)

      if (worldCovered) {
        ranked.unpersist(false)
        remaining.unpersist(false)
        done = true
      } else {
        val next = remaining.join(
          ranked.where(col("settled")).select("qid"), Seq("qid"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nLeft = next.count()
        ranked.unpersist(false)
        remaining.unpersist(false)
        if (nLeft == 0) { next.unpersist(false); done = true }
        else { remaining = next; r *= 2 }
      }
    }
    pts.unpersist(false)
    // results reads from the per-round settled caches; they are released
    // lazily by Spark's LRU once the caller's action has consumed them.
    results
  }
}
