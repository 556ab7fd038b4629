package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding search (the FAISS "SQ8" family) —
  * the memory-side half of the ANN story: a float32 corpus quantized to
  * one byte per dimension is 4× smaller at rest and in shuffle, and
  * quantized cosine needs only integer dot products. Per-vector symmetric
  * scaling keeps the scheme deterministic and engine-portable:
  *
  *   scale = max|v| / 127          (guarded against the zero vector)
  *   code_i = floor(v_i / scale + 0.5)   ∈ [-127, 127]
  *
  * COSINE CANCELS THE SCALES: cos_q(a,b) = Σ ca·cb / √(Σca²·Σcb²) — pure
  * integer sums (exact in Long: 16-dim·127² products stay far under 2^53),
  * one multiply, one correctly-rounded sqrt and divide — so quantized
  * scores are BIT-identical across engines, and the DuckDB oracle replays
  * the whole pipeline (q62). Float→double widening, division, floor and
  * sqrt are all exactly specified by IEEE-754, so the CODES agree
  * cross-engine too.
  */
object Quantize {

  /** per-vector symmetric scale (max|v|/127, zero-vector guarded) */
  def sq8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30)) / 127.0

  /** int8 codes as a long array (exact integer arithmetic downstream) */
  def sq8Codes(vec: Column): Column = {
    val s = sq8Scale(vec)
    transform(vec, x => floor(x.cast("double") / s + 0.5).cast("long"))
  }

  /** integer self-dot Σ c_i² of a code array (native codegen'd loop) */
  private def codeNorm2(codes: Column): Column =
    graft.functions.VecExprs.dotL(codes, codes)

  /** Quantized brute-force cosine top-k within blocks: quantize → block
    * self-join → INTEGER dot per pair → one divide+sqrt for the score.
    * Output (qid, rnk, pid, qdot, cos_q), deterministic tie-break
    * (cos_q desc, pid asc). Same join shape as
    * [[Similarity.cosineTopK]]; the quantized scores track exact cosine
    * within quantization error (recall pinned in QuantizeSpec). */
  def annSq8(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             blockCol: Option[String] = None): DataFrame = {
    val cols = Seq(col(idCol).cast("long").as("id"),
      sq8Codes(col(vecCol)).as("c")) ++ blockCol.map(c => col(c).as("blk"))
    val e = emb.select(cols: _*).withColumn("qn", codeNorm2(col("c")))
    val joinCond = blockCol match {
      case Some(_) => col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id")
      case None => col("a.id") =!= col("b.id")
    }
    // native codegen'd integer loop ([[graft.functions.LongVecDot]]) —
    // exactly the HOF fold's result (integer arithmetic, no rounding),
    // without interpreting a lambda per pair
    val qdot = graft.functions.VecExprs.dotL(col("a.c"), col("b.c"))
    val pairs = e.as("a").join(e.as("b"), joinCond)
      .select(col("a.id").as("qid"), col("b.id").as("pid"), qdot.as("qdot"),
        (col("a.qn") * col("b.qn")).as("qn2"))
      .withColumn("cos_q", col("qdot").cast("double") / sqrt(col("qn2").cast("double")))
    val w = Window.partitionBy("qid").orderBy(col("cos_q").desc, col("pid").asc)
    pairs.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "rnk", "pid", "qdot", "cos_q")
  }

  /** De-quantized reconstruction v̂_i = code_i · scale — for the
    * distortion bound |v − v̂| ≤ scale/2 the spec asserts. */
  def sq8Reconstruct(vec: Column): Column = {
    val s = sq8Scale(vec)
    transform(sq8Codes(vec), c => c.cast("double") * s)
  }
}
