package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`), per the builder brief: brute-force cosine top-k as the
  * correctness baseline, and a sign-random-projection (SRP) LSH-bucketed
  * variant as the scale path. Dot products run as `aggregate`/`zip_with`
  * higher-order functions over doubles with fixed left-to-right order —
  * UDF-free, deterministic.
  */
object Similarity {

  /** Left-to-right dot product of two array columns (cast to double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: every pair scored via a self-join keyed by a
    * blocking column when supplied (else true cross product — only for
    * baseline/oracle scale). Output (qid, rnk, pid, cos). Deterministic
    * tie-break (cos desc, pid asc). */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                 blockCol: Option[String] = None): DataFrame = {
    val cols = Seq(col(idCol).as("id"), col(vecCol).as("v")) ++
      blockCol.map(c => col(c).as("blk"))
    val e = emb.select(cols: _*).withColumn("n", norm(col("v")))
    val joinCond = blockCol match {
      case Some(_) => col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id")
      case None => col("a.id") =!= col("b.id")
    }
    val pairs = e.as("a").join(e.as("b"), joinCond)
      .select(col("a.id").as("qid"), col("b.id").as("pid"),
        (dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("pid").asc)
    pairs.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "rnk", "pid", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for SRP-LSH:
    * plane(p, i) ∈ [-0.5, 0.5), a pure hash-mix of (plane, dim) — identical
    * in any engine, no RNG state. */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(p * 2654435761L + i * 40503L, lit(1000L)).cast("double") / 1000.0) - 0.5

  /** SRP-LSH bucket signature: `nPlanes` sign bits packed into one Long.
    * Vectors in the same bucket are cosine-close with high probability. */
  def srpSignature(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * planeComponent(lit(p.toLong), i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: candidates share an SRP bucket, then exact cosine
    * re-rank within bucket. Returns (qid, rnk, pid, cos) with rnk ≤ k —
    * approximate: recall measured against [[cosineTopK]] in the spec. */
  def annLsh(emb: DataFrame, idCol: String, vecCol: String, k: Int, nPlanes: Int): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("sig", srpSignature(col("v"), nPlanes))
    val pairs = e.as("a").join(e.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("pid"),
        (dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("pid").asc)
    pairs.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "rnk", "pid", "cos")
  }
}
