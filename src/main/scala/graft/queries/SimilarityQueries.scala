package graft.queries

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity-search surface (builder brief): brute-force cosine
  * top-k baseline with an exact DuckDB oracle. The oracle reproduces the
  * left-to-right double fold bit-for-bit via `list_reduce` (products of two
  * floats are exact in double; identical accumulation order → identical
  * IEEE754 results → identical hashes). The LSH-bucketed scale path is
  * checked in SimilaritySpec (recall vs brute force). */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // top-2 nearest neighbours by cosine within each label block
    "q30_ann_cosine" -> ((s, dir) => {
      Similarity.cosineTopK(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          blockCol = Some("label"))
        .orderBy("qid", "rnk")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q30_ann_cosine" ->
      """WITH e AS (SELECT vec_id, label, embedding,
           sqrt(list_reduce(list_transform(list_zip(embedding, embedding),
             l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)) AS n
           FROM embeddings),
         pairs AS (SELECT a.vec_id AS qid, b.vec_id AS pid,
             list_reduce(list_transform(list_zip(a.embedding, b.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (a.n * b.n) AS cos
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, cos FROM
           (SELECT qid, pid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, pid ASC) AS rn
            FROM pairs)
         WHERE rn <= 2 ORDER BY qid, rnk"""
  )
}
