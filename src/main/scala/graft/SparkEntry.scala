package graft

import graft.geo.CellIndex
import graft.io.WebPages
import graft.ops.SpatialJoins
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory lives in `graft.queries.*`; operators in `graft.ops.*`,
  * `graft.geo.*`, `graft.io.*`. */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 step 3, the BASELINE.json benchmark shape):
    * synthetic web pages → per-page extracted geometries → cell/tile
    * assignment → point-in-polygon join against the zone layer →
    * count per (tile, zone). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val ci = CellIndex.Unit20
    val pages = WebPages.pages(spark, 5000, 8)
    val feats = WebPages.features(pages)
    val zones = WebPages.zones(spark, 64).drop("wkb")
    SpatialJoins.pointInBox(feats, zones, ci, 5, broadcastBoxes = true)
      .withColumn("tile_id", ci.encodeCol(col("x"), col("y"), 5))
      .groupBy("tile_id", "poly_id")
      .agg(count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GeoQueries.queries ++ TextQueries.queries ++
      SimilarityQueries.queries ++ GeomQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ StreamingQueries.queries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ GeoQueries.oracleSql ++ TextQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ GeomQueries.oracleSql ++ EventQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ StreamingQueries.oracleSql ++
      PipelineQueries.oracleSql
}
