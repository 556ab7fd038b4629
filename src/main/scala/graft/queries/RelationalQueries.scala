package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.3 J2-J10, §2.4 A1/A4-A8, §2.5,
  * §2.6) exercised over the driver's TPC-H-ish tables, each with a DuckDB
  * oracle. Numeric discipline: every double that crosses the oracle is either
  * integer-valued (exact in IEEE754 under any summation order) or a
  * DECIMAL(18,2)-summed money amount cast back to double — so Spark and
  * DuckDB hash identically.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4 hash aggregation with partial/final (map-side combine)
    "q01_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J2/J4 broadcast-hash equi-joins against dim tables
    "q02_join_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("n_name")
    }),

    // J10 left-semi join
    "q03_semi" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_active"))
        .orderBy("c_mktsegment")
    }),

    // J9 left-anti join (right side restricted so the anti set is non-empty)
    "q04_anti" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 150000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inactive"))
        .orderBy("c_mktsegment")
    }),

    // §2.6 window top-k per group, deterministic tie-break
    "q05_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 2)
        .select("o_custkey", "rnk", "o_orderkey")
        .orderBy("o_custkey", "rnk")
    }),

    // A6 pivot count matrix as conditional aggregation
    "q06_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"))
        .orderBy("o_orderpriority")
    }),

    // A5 exact distinct-count per group
    "q07_distinct_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_supp"),
          countDistinct("l_partkey").as("n_part"))
        .orderBy("l_returnflag")
    }),

    // A1/A11 dense global id assignment — distributed prefix-sum (Ids),
    // provably equal to row_number() - 1 (the DuckDB oracle checks exactly
    // that) without the single-partition window
    "q08_dense_ids" -> ((s, dir) => {
      graft.ops.Ids.denseId(t(s, dir, "orders").select("o_orderkey"),
          "new_id", Seq("o_orderkey"))
        .withColumn("new_id", col("new_id").cast("int"))
        .select("o_orderkey", "new_id")
        .orderBy("o_orderkey")
    }),

    // O5/O6/O7 union + dedup (concat semantics, batch_geojson2coco.py:406-426)
    "q09_union_dedup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.where(col("o_orderstatus") === "O").select("o_orderkey", "o_orderpriority")
      val b = o.where(col("o_totalprice") > 100000.0).select("o_orderkey", "o_orderpriority")
      a.unionByName(b).dropDuplicates("o_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // A1 first-appearance factorization (coco.py:105-106 semantics: ids by
    // first occurrence in doc_id order). Ids via denseId — even a dim-sized
    // global row_number window would single-partition and warn.
    "q10_factorize" -> ((s, dir) => {
      graft.ops.Ids.denseId(
          t(s, dir, "documents").groupBy("lang").agg(min("doc_id").as("first_id")),
          "class_id", Seq("first_id"))
        .withColumn("class_id", col("class_id").cast("int"))
        .select("lang", "class_id")
        .orderBy("class_id")
    }),

    // A8 frequency sort + median/extremes pick (coco_balance.py:99-121)
    "q11_freq_rank" -> ((s, dir) => {
      val freq = t(s, dir, "lineitem").groupBy("l_partkey").agg(count(lit(1)).as("freq"))
      val n = freq.count()
      graft.ops.Ids.denseId(freq, "rn0", Seq("freq", "l_partkey"))
        .withColumn("rn", (col("rn0") + 1).cast("int")).drop("rn0")
        .where(col("rn") === 1 || col("rn") === (n / 2) || col("rn") === n)
        .select("l_partkey", "freq", "rn")
        .orderBy("rn")
    }),

    // A7 per-category id list (coco_balance.py getImgIds-per-cat): sorted
    // distinct ids per group, joined to one string — the driver's pandas
    // hash compare can't sort array cells, and the string form is the same
    // total order both engines agree on
    "q42_cat_list" -> ((s, dir) => {
      t(s, dir, "documents").groupBy("lang")
        .agg(array_join(transform(array_sort(collect_set(col("doc_id"))),
            _.cast("string")), ",").as("docs"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    // P13+P14 string kernels (tile_name from path, numeric-prefix id) over
    // a deterministic synthetic path per document row — the exact column
    // expressions Georeference/CocoToGeojson run in the pipelines
    "q43_path_parts" -> ((s, dir) => {
      val path = concat(col("source"), lit("/"),
        col("doc_id").cast("string"), lit("_tile.png"))
      t(s, dir, "documents").select(col("doc_id"), path.as("path"))
        .withColumn("tile_name",
          graft.io.Georeference.tileNameCol(element_at(split(col("path"), "/"), -1)))
        .withColumn("num_id", graft.io.Georeference.numericIdCol(col("path")))
        .select("doc_id", "tile_name", "num_id")
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         count(*) AS cnt,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q02_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q03_semi" ->
      """SELECT c_mktsegment, count(*) AS n_active FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1 ORDER BY 1""",
    "q04_anti" ->
      """SELECT c_mktsegment, count(*) AS n_inactive FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
         GROUP BY 1 ORDER BY 1""",
    "q05_window_topk" ->
      """SELECT o_custkey, rnk, o_orderkey FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
           FROM orders) WHERE rnk <= 2 ORDER BY o_custkey, rnk""",
    "q06_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
         CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q07_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_partkey) AS n_part
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q08_dense_ids" ->
      """SELECT o_orderkey,
         CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS INTEGER) AS new_id
         FROM orders ORDER BY o_orderkey""",
    "q09_union_dedup" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
           SELECT DISTINCT o_orderkey, o_orderpriority FROM (
             SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus='O'
             UNION ALL
             SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 100000.0))
         GROUP BY 1 ORDER BY 1""",
    "q10_factorize" ->
      """SELECT lang,
         CAST(row_number() OVER (ORDER BY first_id) - 1 AS INTEGER) AS class_id
         FROM (SELECT lang, min(doc_id) AS first_id FROM documents GROUP BY 1)
         ORDER BY class_id""",
    "q11_freq_rank" ->
      """WITH freq AS (SELECT l_partkey, count(*) AS freq FROM lineitem GROUP BY 1),
         ranked AS (SELECT l_partkey, freq,
           CAST(row_number() OVER (ORDER BY freq ASC, l_partkey ASC) AS INTEGER) AS rn
           FROM freq)
         SELECT l_partkey, freq, rn FROM ranked
         WHERE rn = 1 OR rn = (SELECT count(*)//2 FROM freq)
            OR rn = (SELECT count(*) FROM freq)
         ORDER BY rn""",
    "q42_cat_list" ->
      """SELECT lang,
         array_to_string(list(DISTINCT doc_id ORDER BY doc_id), ',') AS docs,
         count(*) AS n
         FROM documents GROUP BY lang ORDER BY lang""",
    "q43_path_parts" ->
      """WITH p AS (SELECT doc_id,
           source || '/' || CAST(doc_id AS VARCHAR) || '_tile.png' AS path
           FROM documents)
         SELECT doc_id,
           split_part(split_part(path, '/', 2), '.', 1) AS tile_name,
           CAST(regexp_extract(split_part(path, '/', 2), '^([0-9]+)', 1) AS BIGINT) AS num_id
         FROM p ORDER BY doc_id"""
  )
}
