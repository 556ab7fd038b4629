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
  * settles almost everything when `level` is chosen so the expected
  * points-per-cell ≳ k.
  *
  * Deterministic ordering: (dist2 asc, pid asc) — ties never depend on
  * partitioning.
  */
object Knn {

  /** queries: (`qid`,`x`,`y`); points: (`pid`,`x`,`y`). Output:
    * (`qid`, `rank` 1..k, `pid`, `dist2`). Self-pairs (qid==pid) are
    * excluded when `excludeSelf`. */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int,
              ci: CellIndex, level: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val cs = ci.cellSize(level)
    val n = 1L << level

    val pts = points
      .select(col("pid"), col("x").as("px"), col("y").as("py"),
        ci.colOfCol(col("x"), level).as("pc"), ci.rowOfCol(col("y"), level).as("pr"))
      .withColumn("pcell", CellIndex.packCol(level, col("pc"), col("pr")))
      .select("pid", "px", "py", "pcell")
      .persist(StorageLevel.MEMORY_AND_DISK)
    pts.count()

    var remaining = queries
      .select(col("qid"), col("x").as("qx"), col("y").as("qy"),
        ci.colOfCol(col("x"), level).as("qc"), ci.rowOfCol(col("y"), level).as("qr"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var results: DataFrame = null
    var r = 1L
    var done = false
    while (!done) {
      // Once the disk would explode too many cells per query, the stragglers
      // are isolated points in sparse space — switch to an exhaustive join
      // (exact by exhaustion) instead of growing the explode O(r²).
      val worldCovered = r >= n || (2 * r + 1) * (2 * r + 1) >= 4096
      val base =
        if (worldCovered) remaining.join(pts)
        else remaining
          .withColumn("_cell", explode(flatten(transform(
            sequence(greatest(col("qc") - r, lit(0L)), least(col("qc") + r, lit(n - 1))),
            c => transform(
              sequence(greatest(col("qr") - r, lit(0L)), least(col("qr") + r, lit(n - 1))),
              rr => CellIndex.packCol(level, c, rr))))))
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
      results = if (results == null) settledRows else results.unionByName(settledRows)

      if (worldCovered) done = true
      else {
        val next = remaining.join(
          ranked.where(col("settled")).select("qid"), Seq("qid"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        if (next.isEmpty) done = true else { remaining = next; r *= 2 }
      }
    }
    results
  }
}
