package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table — the batch analogs of the
  * streaming surface (SURVEY.md §2.9): tumbling-window aggregation and
  * gap-based sessionization (lag windows). Epochs are truncated to whole
  * seconds on both engines so every value is integer-exact. */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling 10-minute windows per event type
    "q35_event_window" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("win", floor(unix_timestamp(col("ts")) / 600L))
        .groupBy("win", "event_type")
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
        .orderBy("win", "event_type")
    }),

    // gap-based sessionization: a new session starts after >30 min idle
    "q36_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("gap", col("sec") - lag("sec", 1).over(w))
        .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q35_event_window" ->
      """SELECT CAST(floor(floor(epoch(ts))/600) AS BIGINT) AS win, event_type,
           count(*) AS n, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q36_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts FROM events),
         g AS (SELECT user_id, sec - lag(sec) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM e)
         SELECT user_id,
           CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           count(*) AS n_events
         FROM g GROUP BY 1 ORDER BY 1"""
  )
}
