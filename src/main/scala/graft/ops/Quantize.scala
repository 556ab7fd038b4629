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
  * the whole pipeline (q62/q63). Float→double widening, division, floor
  * and sqrt are all exactly specified by IEEE-754, so the CODES agree
  * cross-engine too.
  *
  * Quantization itself runs as the native codegen'd
  * [[graft.functions.FloatVecSq8]] expression — ONE scale scan per row;
  * the column-HOF spellings ([[sq8CodesRef]]/[[sq8ReconstructRef]]) stay
  * as the SQL-portable reference twins (bit-parity asserted in
  * QuantizeSpec) but re-evaluate the array_max scan inside the
  * per-element lambda (O(d²) per vector — the reason they are not the
  * production path at embedding dims of 768+).
  */
object Quantize {

  /** per-vector symmetric scale (max|v|/127, zero-vector guarded) */
  def sq8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30)) / 127.0

  /** int8 codes as a long array — native one-scan expression */
  def sq8Codes(vec: Column): Column = graft.functions.VecExprs.sq8(vec)

  /** column-HOF reference twin of [[sq8Codes]] (the shape the DuckDB
    * oracle replays); O(d²) per vector — spec/oracle use only. */
  def sq8CodesRef(vec: Column): Column = {
    val s = sq8Scale(vec)
    transform(vec, x => floor(x.cast("double") / s + 0.5).cast("long"))
  }

  /** integer self-dot Σ c_i² of a code array (native codegen'd loop) */
  private def codeNorm2(codes: Column): Column =
    graft.functions.VecExprs.dotL(codes, codes)

  /** The rank tail every ANN method in this object shares: top-k per
    * query over candidate pairs, deterministic tie-break (score order,
    * then pid asc). One definition so a tie-break or rank change cannot
    * drift between the seven search variants. */
  private def rankTopK(pairs: DataFrame, orderCol: String, ascending: Boolean,
                       k: Int, outCols: Seq[String]): DataFrame = {
    val ord = if (ascending) col(orderCol).asc else col(orderCol).desc
    val w = Window.partitionBy("qid").orderBy(ord, col("pid").asc)
    pairs.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(outCols.map(col): _*)
  }

  /** ADC distance column shared by [[annPq]]/[[annIvfPq]]: codes zipped
    * positionally with the per-query LUT, each code's table entry picked
    * with 1-based `element_at`, folded left-to-right from 0.0 — the
    * exact grouping the DuckDB oracle's `list_reduce` replays. */
  private def adcDistCol(codes: Column, lut: Column): Column =
    aggregate(zip_with(codes, lut, (c, l) => element_at(l, c + lit(1))),
      lit(0.0), (acc, x) => acc + x)

  /** Quantized brute-force cosine top-k within blocks: quantize → block
    * self-join → INTEGER dot per pair → one divide+sqrt for the score.
    * Output (qid, rnk, pid, qdot, cos_q), deterministic tie-break
    * (cos_q desc, pid asc). Same join shape as
    * [[Similarity.cosineTopK]]; the quantized scores track exact cosine
    * within quantization error (recall pinned in QuantizeSpec). All-pairs
    * within a block — the scoring BASELINE; [[annIvfSq8]] is the
    * sub-quadratic production composition. */
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
    rankTopK(pairs, "cos_q", ascending = false, k,
      Seq("qid", "rnk", "pid", "qdot", "cos_q"))
  }

  /** IVF-SQ8 — the FAISS composition a 100 TB embedding store actually
    * runs: SUB-QUADRATIC candidate generation (IVF coarse quantizer) over
    * a 4×-SMALLER quantized corpus with INTEGER scoring.
    *
    * Pipeline: (1) coarse centroids = [[Similarity.annIvf]]'s
    * deterministic hash-strided draw (the vectors with the smallest
    * `(id·2654435761) mod (2^31−1)`), ranked by EXACT float cosine so
    * list assignment matches IVF-Flat's exactly; (2) every vector's SQ8
    * codes + integer self-norm are keyed by its nearest list, queries
    * fan out to their `nProbe` nearest lists; (3) candidates come from
    * the list EQUI-join — never all-pairs; (4) scoring is the integer
    * [[graft.functions.LongVecDot]] over codes (scales cancel in
    * cosine), one divide+sqrt per pair.
    *
    * At scale: centroid selection is a distributed TakeOrdered over
    * nLists rows; the probe join shuffles by list id like any equi-join
    * (nLists ~ √corpus keeps lists bounded); the shuffled payload is the
    * CODE array — one byte of information per dimension instead of four.
    * Only the quantized codes ever reach the join; the float corpus is
    * read once, in the projection. Recall vs exact cosine measured in
    * QuantizeSpec; gated as q63 with a full-pipeline DuckDB oracle.
    *
    * Output (qid, rnk, pid, qdot, cos_q) like [[annSq8]]. */
  def annIvfSq8(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                nLists: Int, nProbe: Int): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // coarse quantizer: identical draw + exact-cosine ranking to annIvf so
    // the two indexes share list structure (and the q41 oracle technique);
    // [[Similarity.ivfCentroids]] also offers k-means refinement there
    val bcC = spark.sparkContext.broadcast(Similarity.ivfCentroids(e, nLists))

    def nearestLists(v: Array[Float], m: Int): Array[Int] =
      Similarity.nearestIn(bcC.value, v, m)
    // quantize ONCE, inside the same partition-local pass as the list
    // assignment (the JVM kernel is the native FloatVecSq8 expression's
    // twin — identical IEEE-754 op sequence, asserted in QuantizeSpec);
    // only codes + integer norms flow into the join
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qSchema = StructType(Seq(
      StructField("list", IntegerType), StructField("id", LongType),
      StructField("c", ArrayType(LongType, containsNull = false)),
      StructField("qn", LongType)))
    implicit val qEnc = org.apache.spark.sql.Encoders.row(qSchema)
    val lists = e.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Float](1).toArray
        val (c, qn) = sq8Kernel(v)
        Row(nearestLists(v, 1).head, r.getLong(0), c.toSeq, qn)
      }
    }.select(col("list"), col("id").as("pid"), col("c").as("pc"), col("qn").as("pn"))
    val probes = e.mapPartitions { it =>
      it.flatMap { r =>
        val v = r.getSeq[Float](1).toArray
        val (c, qn) = sq8Kernel(v)
        val cs = c.toSeq
        nearestLists(v, nProbe).iterator.map(li => Row(li, r.getLong(0), cs, qn))
      }
    }.select(col("list"), col("id").as("qid"), col("c").as("qc"), col("qn").as("qnn"))
    val qdot = graft.functions.VecExprs.dotL(col("qc"), col("pc"))
    val pairs = probes.join(lists, "list")
      .where(col("qid") =!= col("pid"))
      .select(col("qid"), col("pid"), qdot.as("qdot"),
        (col("qnn") * col("pn")).as("qn2"))
      .withColumn("cos_q", col("qdot").cast("double") / sqrt(col("qn2").cast("double")))
    rankTopK(pairs, "cos_q", ascending = false, k,
      Seq("qid", "rnk", "pid", "qdot", "cos_q"))
  }

  /** IVF-SQ8 with exact rerank (FAISS's `IndexRefineFlat` over IVF-SQ8):
    * the quantized index proposes each query's top-`rerankK` candidates
    * (integer scoring over the 4×-smaller codes — [[annIvfSq8]]
    * unchanged), then ONLY those ≤ rerankK·n pairs are re-scored with
    * exact float cosine ([[Similarity.scorePairs]] — auto broadcast vs
    * join from plan stats) and re-ranked to the final top-`k`. This is
    * the standard accuracy knob: quantization error can swap
    * nearly-tied neighbours in the quantized ranking; the refine step
    * restores the EXACT order within the candidate set, so output
    * quality is "exact cosine, restricted to IVF-SQ8 candidates" at the
    * cost of one float read per surviving pair instead of per corpus
    * pair. rerankK ≥ k (a few × k in practice).
    *
    * At scale the rerank adds two equi-joins keyed by vector id
    * (candidates × corpus per endpoint) — shuffle volume is the
    * candidate set, not the corpus; the quantized stage still never
    * touches floats. Output (qid, rnk, pid, cos) like
    * [[Similarity.annIvf]]; gated as q69 with a full-pipeline oracle
    * (the q63 oracle ranked to rerankK, re-scored by the q41 exact-fold
    * arithmetic). */
  def annIvfSq8Rerank(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                      nLists: Int, nProbe: Int, rerankK: Int): DataFrame = {
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    exactRerank(annIvfSq8(emb, idCol, vecCol, rerankK, nLists, nProbe),
      emb, idCol, vecCol, k)
  }

  /** The refine tail shared by the rerank variants: exact float cosine
    * over the candidate (qid, pid) pairs ([[Similarity.scorePairs]] —
    * auto broadcast vs join), re-ranked (cos desc, pid asc) to top-k. */
  private def exactRerank(cand: DataFrame, emb: DataFrame, idCol: String,
                          vecCol: String, k: Int): DataFrame = {
    val scored = Similarity.scorePairs(cand.select("qid", "pid"), emb, idCol, vecCol)
    rankTopK(scored, "cos", ascending = false, k, Seq("qid", "rnk", "pid", "cos"))
  }

  // ------------------------------------------------------------------
  // Product quantization (the FAISS "PQ" family) — the compression tier
  // BEYOND SQ8: the vector is split into m subspaces and each subspace
  // is vector-quantized against its own ksub-entry codebook, so a
  // D-float vector becomes m small codes (log2(ksub) bits each) —
  // 4D bytes → m bytes at ksub ≤ 256 (32× at D=64, m=8). Search is
  // ADC (asymmetric distance computation): the QUERY stays float, one
  // m×ksub lookup table of exact subspace L2 distances is built per
  // query, and each corpus vector's distance is m table lookups + a
  // sum — ||q − ŷ||² for the PQ reconstruction ŷ, never touching the
  // corpus floats. At 768 dims this is what large embedding stores
  // actually run (SQ8's 4× stops paying long before PQ's 32-64× does).
  // ------------------------------------------------------------------

  /** PQ codebooks from the deterministic hash-strided draw (the SAME
    * seed selection as [[Similarity.ivfCentroids]], so the DuckDB
    * oracle replays it with the q41/q63 technique): the `ksub` vectors
    * with the smallest `(id·2654435761) mod (2^31−1)`, sliced into `m`
    * equal subspaces; codebook index = draw rank. k-means-free and
    * engine-portable; selection is a distributed TakeOrdered over ksub
    * rows, never a collect of the corpus. Returns m × ksub × (D/m). */
  def pqCodebooks(e: DataFrame, m: Int, ksub: Int): Array[Array[Array[Float]]] = {
    // the at-rest tier packs one code per SIGNED byte (Lake.writePqEmbeddings
    // / BytesSdcDist): ksub <= 128 keeps codes in [0,127]; a 256-entry
    // codebook needs an unsigned decode tier that does not exist yet
    require(ksub >= 1 && ksub <= 128,
      s"ksub=$ksub out of the signed-byte code range [1,128]")
    val seeds = Similarity.ivfCentroids(e, ksub) // (rank, vec, norm), rank 0-based
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      seeds.sortBy(_._1).map { case (_, v, _) => v.slice(s * dsub, (s + 1) * dsub) }
    }
  }

  /** Per-subspace argmin-L2 encoding: code_s = the codebook entry
    * minimizing Σ_d (x_d − c_d)² (floats widened to double, left-to-
    * right fold — the exact IEEE-754 sequence the oracle replays), ties
    * to the SMALLEST codebook index. */
  def pqEncodeKernel(v: Array[Float], cb: Array[Array[Array[Float]]]): Array[Int] = {
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val dsub = cb(s)(0).length
      var best = Double.PositiveInfinity; var bestJ = 0
      var j = 0
      while (j < cb(s).length) {
        val c = cb(s)(j)
        var acc = 0.0; var d = 0
        while (d < dsub) {
          val diff = v(s * dsub + d).toDouble - c(d).toDouble
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestJ = j } // strict < keeps earliest j on ties
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    out
  }

  /** Per-query ADC lookup table: lut(s)(j) = exact subspace L2 between
    * the query's s-th slice and codebook entry j — same fold as
    * [[pqEncodeKernel]]. m×ksub doubles per query (~1 KB at 8×16). */
  def pqLutKernel(v: Array[Float], cb: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val m = cb.length
    Array.tabulate(m) { s =>
      val dsub = cb(s)(0).length
      Array.tabulate(cb(s).length) { j =>
        val c = cb(s)(j)
        var acc = 0.0; var d = 0
        while (d < dsub) {
          val diff = v(s * dsub + d).toDouble - c(d).toDouble
          acc += diff * diff
          d += 1
        }
        acc
      }
    }
  }

  /** PQ-ADC top-k within blocks: corpus encoded ONCE to m codes per
    * vector (partition-local kernel, broadcast codebooks — only the
    * codes reach the join), each query carries its LUT, and the
    * per-pair distance is a column-side HOF — m `element_at` lookups
    * folded left-to-right, so the whole score is engine-portable and
    * the DuckDB oracle replays draw → encode → ADC → rank end to end
    * (q70). Output (qid, rnk, pid, dist) ranked by ADC distance ASC
    * (dist = ||q − ŷ||², ŷ the PQ reconstruction — identity asserted
    * in QuantizeSpec), ties pid ASC. Same block equi-join shape as
    * [[annSq8]]; at corpus scale the shuffled payload is m bytes of
    * code per corpus row and ~ksub·m doubles per query row. */
  def annPq(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            m: Int, ksub: Int, blockCol: Option[String] = None): DataFrame = {
    val spark = emb.sparkSession
    val baseCols = Seq(col(idCol).cast("long").as("id"), col(vecCol).as("v")) ++
      blockCol.map(c => col(c).as("blk"))
    val e = emb.select(baseCols: _*)
    val bcCb = spark.sparkContext.broadcast(
      pqCodebooks(emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")), m, ksub))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val hasBlk = blockCol.isDefined
    val blkField = if (hasBlk) Seq(StructField("blk",
      e.schema.find(_.name == "blk").get.dataType)) else Nil
    val codesSchema = StructType(Seq(StructField("id", LongType),
      StructField("codes", ArrayType(IntegerType, containsNull = false))) ++ blkField)
    val lutSchema = StructType(Seq(StructField("id", LongType),
      StructField("lut", ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false))) ++ blkField)
    implicit val cEnc = org.apache.spark.sql.Encoders.row(codesSchema)
    val corpus = e.mapPartitions { it =>
      it.map { r =>
        val vals = Seq(r.getLong(0),
          pqEncodeKernel(r.getSeq[Float](1).toArray, bcCb.value).toSeq) ++
          (if (hasBlk) Seq(r.get(2)) else Nil)
        Row(vals: _*)
      }
    }(cEnc).select((Seq(col("id").as("pid"), col("codes")) ++
      (if (hasBlk) Seq(col("blk")) else Nil)): _*)
    implicit val lEnc = org.apache.spark.sql.Encoders.row(lutSchema)
    val queries = e.mapPartitions { it =>
      it.map { r =>
        val vals = Seq(r.getLong(0),
          pqLutKernel(r.getSeq[Float](1).toArray, bcCb.value).map(_.toSeq).toSeq) ++
          (if (hasBlk) Seq(r.get(2)) else Nil)
        Row(vals: _*)
      }
    }(lEnc).select((Seq(col("id").as("qid"), col("lut")) ++
      (if (hasBlk) Seq(col("blk")) else Nil)): _*)
    val joined =
      if (hasBlk) queries.join(corpus, "blk").where(col("qid") =!= col("pid"))
      else queries.crossJoin(corpus).where(col("qid") =!= col("pid"))
    val dist = adcDistCol(col("codes"), col("lut"))
    val scored = joined.select(col("qid"), col("pid"), dist.as("dist"))
    rankTopK(scored, "dist", ascending = true, k, Seq("qid", "rnk", "pid", "dist"))
  }

  /** IVF-PQ (FAISS's flagship billion-scale index, the
    * `by_residual=false` configuration): IVF's coarse quantizer prunes
    * candidates to the nProbe probed lists — the SAME deterministic
    * draw and exact-cosine assignment as [[Similarity.annIvf]] /
    * [[annIvfSq8]], so all three indexes share list structure — and
    * the surviving pairs are scored by PQ-ADC over m codes per corpus
    * vector ([[annPq]]'s table-lookup HOF). The join moves m bytes of
    * information per corpus row (32× under SQ8's already-4×-smaller
    * codes at D=64, m=8) and one LUT per probing query; the float
    * corpus is read once, in the encode projection, and never shuffled.
    * Output (qid, rnk, pid, dist) ranked by ADC distance ASC, ties pid
    * ASC — for the pairs it returns, distances are IDENTICAL to
    * [[annPq]]'s (composition changes candidates only; asserted in
    * QuantizeSpec). Gated q71: the oracle replays the q63 list
    * assignment × the q70 encode/ADC, end to end. */
  def annIvfPq(emb: DataFrame, idCol: String, vecCol: String, k: Int,
               nLists: Int, nProbe: Int, m: Int, ksub: Int): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val bcC = spark.sparkContext.broadcast(Similarity.ivfCentroids(e, nLists))
    val bcCb = spark.sparkContext.broadcast(pqCodebooks(e, m, ksub))
    def nearestLists(v: Array[Float], n: Int): Array[Int] =
      Similarity.nearestIn(bcC.value, v, n)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val codesSchema = StructType(Seq(StructField("list", IntegerType),
      StructField("id", LongType),
      StructField("codes", ArrayType(IntegerType, containsNull = false))))
    val lutSchema = StructType(Seq(StructField("list", IntegerType),
      StructField("id", LongType),
      StructField("lut", ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false))))
    implicit val cEnc = org.apache.spark.sql.Encoders.row(codesSchema)
    val lists = e.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Float](1).toArray
        Row(nearestLists(v, 1).head, r.getLong(0), pqEncodeKernel(v, bcCb.value).toSeq)
      }
    }(cEnc).select(col("list"), col("id").as("pid"), col("codes"))
    implicit val lEnc = org.apache.spark.sql.Encoders.row(lutSchema)
    val probes = e.mapPartitions { it =>
      it.flatMap { r =>
        val v = r.getSeq[Float](1).toArray
        val lut = pqLutKernel(v, bcCb.value).map(_.toSeq).toSeq
        nearestLists(v, nProbe).iterator.map(li => Row(li, r.getLong(0), lut))
      }
    }(lEnc).select(col("list"), col("id").as("qid"), col("lut"))
    val dist = adcDistCol(col("codes"), col("lut"))
    val scored = probes.join(lists, "list")
      .where(col("qid") =!= col("pid"))
      .select(col("qid"), col("pid"), dist.as("dist"))
    rankTopK(scored, "dist", ascending = true, k, Seq("qid", "rnk", "pid", "dist"))
  }

  /** IVF-PQ with exact rerank (FAISS `IndexRefineFlat` over IVFPQ) —
    * the full production stack: list pruning bounds the candidate set,
    * PQ-ADC ranks it from m-byte codes, and exact float cosine
    * re-ranks the quantized top-`rerankK` to the final top-`k`. The
    * refine matters MOST here: PQ's reconstruction error is the
    * coarsest of the family (an m-byte code cannot rank neighbours
    * closer together than the quantization cell — q70's spec documents
    * the negative), so the exact pass restores intra-cell order at one
    * float read per surviving pair. Output (qid, rnk, pid, cos); gated
    * q72 (the q71 oracle ranked to rerankK + the q41 exact-fold
    * rerank). */
  def annIvfPqRerank(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                     nLists: Int, nProbe: Int, m: Int, ksub: Int,
                     rerankK: Int): DataFrame = {
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    exactRerank(annIvfPq(emb, idCol, vecCol, rerankK, nLists, nProbe, m, ksub),
      emb, idCol, vecCol, k)
  }

  /** SDC table for PQ codes: sdc(s)(i)(j) = exact subspace L2 between
    * codebook entries i and j (same left-to-right fold as the ADC LUT).
    * m×ksub² doubles (8×16² = 2 K at the gate geometry; at production
    * dims think 96 subspaces × 128² = 1.6 M — still broadcast-trivial;
    * ksub is capped at 128 by the signed-byte code layout, see
    * [[pqCodebooks]]).
    * Symmetric distance computation is FAISS's all-quantized mode: when
    * only the at-rest codes exist on BOTH sides (self-search over a PQ
    * lake table, no float read at all), dist(x,y) ≈ ||x̂ − ŷ||² — the
    * price is both reconstructions' error instead of one. */
  def pqSdcTable(cb: Array[Array[Array[Float]]]): Array[Array[Array[Double]]] =
    cb.map { entries =>
      Array.tabulate(entries.length) { i =>
        Array.tabulate(entries.length) { j =>
          var acc = 0.0; var d = 0
          while (d < entries(i).length) {
            val diff = entries(i)(d).toDouble - entries(j)(d).toDouble
            acc += diff * diff
            d += 1
          }
          acc
        }
      }
    }

  /** PQ-SDC top-k DIRECTLY over the at-rest layout (id, BINARY codes
    * [, block]) — no float column is read anywhere: per-pair distance is
    * m lookups into the SDC table via the native codegen'd
    * [[graft.functions.BytesSdcDist]] (the table rides along as a
    * codegen reference object; the packed bytes are the join payload —
    * no unpack projection). Self-search shape of [[annPq]]; distances
    * equal the L2 between the two PQ reconstructions (subspace-blocked
    * — asserted in LakeSpec; bit-parity with the HOF twin
    * [[annPqSdcRef]] in both eval modes — QuantizeSpec). Output
    * (qid, rnk, pid, dist), dist ASC, ties pid ASC. */
  def annPqSdc(quant: DataFrame, cb: Array[Array[Array[Float]]],
               idCol: String, codesCol: String, k: Int,
               blockCol: Option[String] = None): DataFrame = {
    val cols = Seq(col(idCol).cast("long").as("id"),
      col(codesCol).as("c")) ++ blockCol.map(c => col(c).as("blk"))
    val e = quant.select(cols: _*)
    val joinCond = blockCol match {
      case Some(_) => col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id")
      case None => col("a.id") =!= col("b.id")
    }
    val dist = graft.functions.VecExprs.sdcDist(col("a.c"), col("b.c"), pqSdcTable(cb))
    val pairs = e.as("a").join(e.as("b"), joinCond)
      .select(col("a.id").as("qid"), col("b.id").as("pid"), dist.as("dist"))
    rankTopK(pairs, "dist", ascending = true, k, Seq("qid", "rnk", "pid", "dist"))
  }

  /** Column-HOF reference twin of [[annPqSdc]]'s scoring (interpreted
    * lambda + three nested `element_at`s per subspace per pair — the
    * SQL-portable spelling; bit-parity with the native path asserted in
    * QuantizeSpec). Spec/oracle use only. */
  def annPqSdcRef(quant: DataFrame, cb: Array[Array[Array[Float]]],
                  idCol: String, codesCol: String, k: Int,
                  blockCol: Option[String] = None): DataFrame = {
    val m = cb.length
    val tbl = typedLit(pqSdcTable(cb).map(_.map(_.toSeq).toSeq).toSeq)
    val cols = Seq(col(idCol).cast("long").as("id"),
      graft.functions.VecExprs.sq8BytesToLongs(col(codesCol)).as("c")) ++
      blockCol.map(c => col(c).as("blk"))
    val e = quant.select(cols: _*)
    val joinCond = blockCol match {
      case Some(_) => col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id")
      case None => col("a.id") =!= col("b.id")
    }
    // dist = Σ_s tbl[s][qc_s][pc_s] — all 1-based element_at, fold from 0.0
    val dist = aggregate(
      transform(sequence(lit(0), lit(m - 1)), s =>
        element_at(
          element_at(element_at(tbl, s + lit(1)),
            element_at(col("a.c"), s + lit(1)).cast("int") + lit(1)),
          element_at(col("b.c"), s + lit(1)).cast("int") + lit(1))),
      lit(0.0), (acc, x) => acc + x)
    val pairs = e.as("a").join(e.as("b"), joinCond)
      .select(col("a.id").as("qid"), col("b.id").as("pid"), dist.as("dist"))
    rankTopK(pairs, "dist", ascending = true, k, Seq("qid", "rnk", "pid", "dist"))
  }

  /** SQ8 codes packed as BINARY — one signed byte per dimension, the
    * AT-REST layout ([[graft.lake.Lake.writeQuantizedEmbeddings]]): a
    * parquet embedding table stores d bytes per vector instead of 4d. */
  def sq8Bytes(vec: Column): Column = graft.functions.VecExprs.sq8Bytes(vec)

  /** binary codes → `array<long>` (read-side bridge to the scoring tier) */
  def bytesToCodes(codes: Column): Column =
    graft.functions.VecExprs.sq8BytesToLongs(codes)

  /** Quantized brute-force cosine top-k DIRECTLY over the at-rest layout
    * (id, binary codes [, block]): same join/rank shape as [[annSq8]],
    * scored with the native [[graft.functions.BytesVecDot]] over the
    * packed bytes — no float corpus read, no per-row array
    * materialization. Bit-identical to [[annSq8]] on the same vectors
    * (same integer dots, same divide+sqrt — asserted in QuantizeSpec). */
  def annSq8FromCodes(quant: DataFrame, idCol: String, codesCol: String, k: Int,
                      blockCol: Option[String] = None): DataFrame = {
    import graft.functions.VecExprs
    val cols = Seq(col(idCol).cast("long").as("id"),
      col(codesCol).as("c")) ++ blockCol.map(c => col(c).as("blk"))
    val e = quant.select(cols: _*)
      .withColumn("qn", VecExprs.dotB(col("c"), col("c")))
    val joinCond = blockCol match {
      case Some(_) => col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id")
      case None => col("a.id") =!= col("b.id")
    }
    val qdot = VecExprs.dotB(col("a.c"), col("b.c"))
    val pairs = e.as("a").join(e.as("b"), joinCond)
      .select(col("a.id").as("qid"), col("b.id").as("pid"), qdot.as("qdot"),
        (col("a.qn") * col("b.qn")).as("qn2"))
      .withColumn("cos_q", col("qdot").cast("double") / sqrt(col("qn2").cast("double")))
    rankTopK(pairs, "cos_q", ascending = false, k,
      Seq("qid", "rnk", "pid", "qdot", "cos_q"))
  }

  /** JVM twin of [[graft.functions.FloatVecSq8]] + the integer self-norm:
    * (codes, Σc²) in one pass — identical IEEE-754 op sequence (same
    * NegativeInfinity-seeded max scan, same max(·,1e-30)/127 scale, same
    * floor(+0.5)), asserted bit-equal to the native expression in
    * QuantizeSpec. Used where quantization happens inside a
    * partition-local kernel ([[annIvfSq8]]'s assignment pass). */
  def sq8Kernel(v: Array[Float]): (Array[Long], Long) = {
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < v.length) {
      val ab = math.abs(v(i).toDouble)
      if (ab > mx) mx = ab
      i += 1
    }
    val s = math.max(mx, 1e-30) / 127.0
    val out = new Array[Long](v.length)
    var n2 = 0L
    i = 0
    while (i < v.length) {
      val c = math.floor(v(i).toDouble / s + 0.5).toLong
      out(i) = c
      n2 += c * c
      i += 1
    }
    (out, n2)
  }

  /** De-quantized reconstruction v̂_i = code_i · scale — for the
    * distortion bound |v − v̂| ≤ scale/2 the spec asserts. Native
    * one-scan expression. */
  def sq8Reconstruct(vec: Column): Column = graft.functions.VecExprs.sq8Recon(vec)

  /** column-HOF reference twin of [[sq8Reconstruct]] — spec use only. */
  def sq8ReconstructRef(vec: Column): Column = {
    val s = sq8Scale(vec)
    transform(sq8CodesRef(vec), c => c.cast("double") * s)
  }
}
