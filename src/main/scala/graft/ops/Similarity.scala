package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`), per the builder brief: brute-force cosine top-k as the
  * correctness baseline, and a sign-random-projection (SRP) LSH-bucketed
  * variant as the scale path. Per-pair dot products on the hot join paths
  * run as the native codegen'd [[graft.functions.FloatVecDot]] expression;
  * the `aggregate`/`zip_with` higher-order [[dot]] stays as the
  * SQL-portable reference form (same left-to-right double fold — the two
  * are bit-identical, spec-asserted — and the shape the DuckDB oracle
  * replays via `list_reduce`). UDF-free, deterministic either way.
  */
object Similarity extends Serializable {

  /** Left-to-right dot product of two array columns (cast to double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: every pair scored via a self-join keyed by a
    * blocking column when supplied (else true cross product — only for
    * baseline/oracle scale). Output (qid, rnk, pid, cos). Deterministic
    * tie-break (cos desc, pid asc). The per-pair dot runs as the native
    * codegen'd [[graft.functions.FloatVecDot]] expression (same
    * left-to-right IEEE-754 fold as the [[dot]] HOF and the broadcast JVM
    * kernels — bit-identical, asserted in the specs — but inlined into
    * whole-stage codegen instead of interpreting a lambda per pair). */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                 blockCol: Option[String] = None): DataFrame = {
    import graft.functions.VecExprs
    val cols = Seq(col(idCol).as("id"), col(vecCol).as("v")) ++
      blockCol.map(c => col(c).as("blk"))
    val e = emb.select(cols: _*).withColumn("n", VecExprs.normF(col("v")))
    val joinCond = blockCol match {
      case Some(_) => col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id")
      case None => col("a.id") =!= col("b.id")
    }
    val pairs = e.as("a").join(e.as("b"), joinCond)
      .select(col("a.id").as("qid"), col("b.id").as("pid"),
        (VecExprs.dotF(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cos"))
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
    * Vectors in the same bucket are cosine-close with high probability.
    * Runs as the native codegen'd [[graft.functions.FloatVecSrpKeys]]
    * expression (one band of nPlanes bits) — bit-identical to the
    * column-HOF twin [[srpSignatureRef]], asserted in SimilaritySpec. */
  def srpSignature(vec: Column, nPlanes: Int): Column =
    element_at(graft.functions.VecExprs.srpKeys(vec, 1, nPlanes), 1)

  /** Column-HOF reference twin of [[srpSignature]] (the SQL-portable
    * spelling the DuckDB oracles replay); interprets a lambda per
    * (vector, plane) — spec/oracle use only. */
  def srpSignatureRef(vec: Column, nPlanes: Int): Column = {
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
    * approximate: recall measured against [[cosineTopK]] in the spec.
    * Single-table: all `nPlanes` bits must match, so recall collapses as
    * nPlanes grows — [[annLshBanded]] is the production path. */
  def annLsh(emb: DataFrame, idCol: String, vecCol: String, k: Int, nPlanes: Int): DataFrame = {
    import graft.functions.VecExprs
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", VecExprs.normF(col("v")))
      .withColumn("sig", srpSignature(col("v"), nPlanes))
    val pairs = e.as("a").join(e.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("pid"),
        (VecExprs.dotF(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("pid").asc)
    pairs.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "rnk", "pid", "cos")
  }

  /** One band's SRP key: `rowsPerBand` sign bits from planes
    * [band·rowsPerBand, (band+1)·rowsPerBand), packed into a Long. Pure
    * column arithmetic — reproducible in the DuckDB oracle. */
  def bandKeyCol(vec: Column, band: Column, rowsPerBand: Int): Column = {
    val bits = (0 until rowsPerBand).map { j =>
      val p = (band * rowsPerBand + j).cast("long")
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * planeComponent(p, i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Banded multi-table SRP-LSH ANN — the scale path. `bands` independent
    * hash tables of `rowsPerBand` sign bits each; candidates are the UNION
    * of per-band bucket matches (OR-amplification: collision prob
    * 1−(1−s^r)^b for cosine similarity s, instead of the single-table s^r
    * which collapses as r grows), then exact cosine re-rank of candidates.
    *
    * Plan shape: signature projection stays in whole-stage codegen; the
    * candidate step is a self-EQUI-join on (band, bandkey) — bucketed,
    * never all-pairs; the re-rank scores only candidate pairs with the JVM
    * fold kernel. At 100 TB the (band, bandkey) join shuffles both sides by
    * key like any other equi-join; no stage is quadratic in the corpus. */
  /** JVM twin of [[bandKeyCol]] — identical IEEE754 op sequence (same
    * products, same left-to-right fold), ~10× faster than evaluating the
    * interpreted higher-order-function expression per (vector, band): HOFs
    * do not participate in whole-stage codegen. Cross-checked equal to the
    * column form in SimilaritySpec. */
  def bandKeyKernel(v: Array[Float], band: Int, rowsPerBand: Int): Long = {
    var key = 0L
    var j = 0
    while (j < rowsPerBand) {
      val p = (band * rowsPerBand + j).toLong
      var proj = 0.0
      var i = 0
      while (i < v.length) {
        val pc = ((p * 2654435761L + i * 40503L) % 1000L).toDouble / 1000.0 - 0.5
        proj += v(i).toDouble * pc
        i += 1
      }
      if (proj > 0) key |= (1L << j)
      j += 1
    }
    key
  }

  /** Banded SRP-LSH candidate pairs — the candidate stage shared by
    * [[annLshBanded]] and the end-to-end near-dup pipeline
    * ([[Dedup.nearDupGroups]]). Distinct (a, b) with a < b; the self-join
    * is an EQUI-join on (band, bandkey), never all-pairs. */
  def lshCandidatePairs(emb: DataFrame, idCol: String, vecCol: String,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val e = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // ALL band keys in one native expression evaluation per vector
    // ([[graft.functions.FloatVecSrpKeys]], bit-identical to
    // [[bandKeyKernel]]), then posexplode to the (id, band, bkey) layout —
    // signature generation stays in whole-stage codegen end to end (the
    // previous mapPartitions kernel paid the row codec on every vector)
    val sigs = e.select(col("id"),
      posexplode(graft.functions.VecExprs.srpKeys(col("v"), bands, rowsPerBand))
        .as(Seq("band", "bkey")))
    // rename on independent projections — same-lineage self-joins silently
    // mis-resolve the a<b predicate
    val left = sigs.select(col("id").as("a"), col("band"), col("bkey"))
    val right = sigs.select(col("id").as("b"), col("band"), col("bkey"))
    left.join(right, Seq("band", "bkey"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  def annLshBanded(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                   bands: Int, rowsPerBand: Int): DataFrame = {
    // round 6: the directed candidate set {(a,b), (b,a) : a,b share a
    // band bucket, a ≠ b} is produced DIRECTLY by the (band, bandkey)
    // self-join with an a ≠ b predicate — one join + one distinct. The
    // round-5 spelling built the a < b half ([[lshCandidatePairs]]) and
    // unioned its mirror, which evaluated the whole candidate join+
    // distinct TWICE (both union branches carry the full subtree) and
    // shuffled the distinct twice. Same set, half the candidate work.
    // ([[lshCandidatePairs]] stays as the a < b API for the dedup
    // pipelines, which genuinely want one row per unordered pair.)
    val e = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val sigs = e.select(col("id"),
      posexplode(graft.functions.VecExprs.srpKeys(col("v"), bands, rowsPerBand))
        .as(Seq("band", "bkey")))
    val left = sigs.select(col("id").as("qid"), col("band"), col("bkey"))
    val right = sigs.select(col("id").as("pid"), col("band"), col("bkey"))
    val directed = left.join(right, Seq("band", "bkey"))
      .where(col("qid") =!= col("pid"))
      .select("qid", "pid").distinct()
    val scored = scorePairs(directed, emb, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("pid").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "rnk", "pid", "cos")
  }

  /** IVF-Flat ANN (the brief's second scale path next to LSH): a coarse
    * quantizer of `nLists` deterministic centroids — the vectors with the
    * smallest `mix(id) = (id·2654435761) mod (2^31−1)`, i.e. a seeded
    * hash-strided sample of the corpus, k-means-free so results are
    * reproducible across engines/runs. Unlike first-N-by-id (which on
    * id-clustered data draws all centroids from one region and lets a
    * single list absorb the corpus), the hash draw is uniform over the id
    * space regardless of insertion order; selection is a distributed
    * top-nLists (TakeOrdered), never a full sort or collect. Every vector
    * is assigned to its nearest centroid, and each query probes its
    * `nProbe` nearest lists with an exact cosine re-rank inside them. The
    * probe is an EQUI-join on list id — never all-pairs; at corpus scale
    * the lists shard by key like any join, nLists scales with √corpus so
    * list sizes stay bounded, and `maxListSize` salts any residual hot
    * list into (list, salt) sub-keys — candidate-set-preserving, output
    * identical (asserted in the spec). Recall measured vs brute force in
    * the spec. */
  /** Nearest `m` centroid list ids by cosine (desc, list asc tie-break).
    * Also the kernel behind [[graft.functions.FloatVecNearestLists]]. */
  private[graft] def nearestIn(cents: Array[(Int, Array[Float], Double)],
                               v: Array[Float], m: Int): Array[Int] = {
    var s = 0.0; var d = 0
    while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
    val n = math.sqrt(s)
    cents.map { case (li, cv, cn) =>
      var dot = 0.0; var i = 0
      while (i < v.length) { dot += v(i).toDouble * cv(i).toDouble; i += 1 }
      (-(dot / (n * cn)), li) // cosine desc
    }.sorted.take(m).map(_._2)
  }

  /** fixed-point scale for the deterministic k-means reduction */
  private val KmFx = 1048576.0 // 2^20

  /** IVF coarse-quantizer centroids: the deterministic hash-strided seed
    * draw, optionally refined by `kmeansIters` distributed Lloyd rounds.
    * Each round assigns every vector to its nearest centroid and replaces
    * the centroid with its list's MEAN — computed over 2^20 FIXED-POINT
    * longs, so the distributed sum is ORDER-INDEPENDENT and the refined
    * centroids are exactly reproducible across runs/partitionings (a
    * float sum would drift in the low bits with reduction order). One
    * hash-agg per round keyed by (list, dim) — map-side partials shrink
    * the shuffle to nLists·dim rows per task; empty lists keep their
    * seed. Real IVF training, the FAISS `train()` analog. */
  def ivfCentroids(e: DataFrame, nLists: Int,
                   kmeansIters: Int = 0): Array[(Int, Array[Float], Double)] = {
    val spark = e.sparkSession
    def withNorm(i: Int, v: Array[Float]): (Int, Array[Float], Double) = {
      var s = 0.0; var d = 0
      while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
      (i, v, math.sqrt(s))
    }
    var cents = e
      .withColumn("mix", pmod(col("id") * lit(2654435761L), lit(2147483647L)))
      .orderBy("mix", "id").limit(nLists)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
      .zipWithIndex.map { case (v, i) => withNorm(i, v) }
    var iter = 0
    while (iter < kmeansIters) {
      val bc = spark.sparkContext.broadcast(cents)
      val rowSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("list", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("dim", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("fx", org.apache.spark.sql.types.LongType)))
      implicit val enc = org.apache.spark.sql.Encoders.row(rowSchema)
      val sums = e.mapPartitions { it =>
        it.flatMap { r =>
          val v = r.getSeq[Float](1).toArray
          val li = nearestIn(bc.value, v, 1).head
          v.indices.iterator.map(d => Row(li, d, math.round(v(d).toDouble * KmFx)))
        }
      }.groupBy("list", "dim")
        .agg(sum("fx").as("s"), count(lit(1)).as("n"))
        .collect()
      val byList = sums.groupBy(_.getInt(0))
      cents = cents.map { case (li, oldV, oldN) =>
        byList.get(li) match {
          case Some(rows) =>
            val nv = new Array[Float](oldV.length)
            rows.foreach { r =>
              nv(r.getInt(1)) = ((r.getLong(2).toDouble / r.getLong(3)) / KmFx).toFloat
            }
            withNorm(li, nv)
          case None => (li, oldV, oldN)
        }
      }
      iter += 1
    }
    cents
  }

  def annIvf(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             nLists: Int, nProbe: Int, maxListSize: Int = Int.MaxValue,
             kmeansIters: Int = 0): DataFrame = {
    import graft.functions.AnnExprs
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val cents = ivfCentroids(e, nLists, kmeansIters)
    // round 6: list assignment as a native codegen'd projection (the
    // expression calls [[nearestIn]] verbatim — identical list ids) in
    // place of the mapPartitions row kernels, AND the probe join now
    // carries only (list, id) — the round-5 shape shuffled both sides'
    // FLOAT VECTORS through the join and then dropped them unread
    // (scorePairs re-fetches vectors by id); projecting them out cuts the
    // join payload from ~4·dim bytes/row to 12 (guide §2.3).
    val lists = e.select(AnnExprs.nearestList(col("v"), cents).as("list"),
      col("id").as("pid"))
    val probes = e.select(col("id").as("qid"),
        explode(AnnExprs.nearestLists(col("v"), cents, nProbe)).as("list"))
    val cand =
      if (maxListSize == Int.MaxValue)
        probes.join(lists, "list")
          .where(col("qid") =!= col("pid"))
          .select(col("qid"), col("pid"))
      else {
        // list-size cap: a list of size s splits into ceil(s/maxListSize)
        // salt sub-keys; members hash onto one salt, probes fan out to all
        // of them — the candidate set is UNCHANGED (pure skew mitigation),
        // only the join key cardinality grows. Costs one aggregation job
        // over nLists rows (not corpus rows).
        val sizes = lists.groupBy("list").count().collect()
          .map(r => r.getInt(0) -> math.max(1L,
            (r.getLong(1) + maxListSize - 1) / maxListSize).toInt).toMap
        val bcSalts = spark.sparkContext.broadcast(sizes)
        val saltOf = udf { (list: Int, pid: Long) =>
          java.lang.Math.floorMod(pid * 40503L, bcSalts.value.getOrElse(list, 1).toLong).toInt
        }
        val saltsOf = udf { (list: Int) => (0 until bcSalts.value.getOrElse(list, 1)).toArray }
        probes.withColumn("salt", explode(saltsOf(col("list"))))
          .join(lists.withColumn("salt", saltOf(col("list"), col("pid"))),
            Seq("list", "salt"))
          .where(col("qid") =!= col("pid"))
          .select(col("qid"), col("pid"))
      }
    val scored = scorePairs(cand, emb, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("pid").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "rnk", "pid", "cos")
  }

  /** Plan-stats size (bytes) below which [[scorePairs]] collects+broadcasts
    * the vector table; above it the vectors are shuffled onto the pairs.
    * 256 MB of float vectors is dim-table territory for an 8g+ driver.
    * Override per session with `graft.similarity.broadcastBytes`. */
  val BroadcastVecBytes: Long = 256L << 20

  /** Exact cosine for candidate (qid, pid) pairs — auto-selects the plan
    * from the vector table's Catalyst size estimate (no extra job): a
    * dim-table-sized corpus takes the zero-shuffle broadcast arm, anything
    * bigger joins the vectors onto the pairs. Both arms run the same JVM
    * fold kernel per row, so results are bit-identical either way. */
  def scorePairs(pairs: DataFrame, emb: DataFrame, idCol: String,
                 vecCol: String): DataFrame = {
    val threshold = emb.sparkSession.conf
      .get("graft.similarity.broadcastBytes", BroadcastVecBytes.toString).toLong
    val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= BigInt(threshold)) scorePairsBroadcast(pairs, emb, idCol, vecCol)
    else scorePairsJoin(pairs, emb, idCol, vecCol)
  }

  /** Exact cosine for candidate (qid, pid) pairs with the vector table
    * JOINED onto the pairs — the corpus-scale path: two equi-joins key the
    * pairs by each endpoint (AQE picks shuffle-hash/broadcast per side from
    * runtime stats), nothing is ever collected to the driver. The per-row
    * kernel repeats [[scorePairsBroadcast]]'s left-to-right IEEE754 folds
    * (dot, then each norm as sum-of-squares + sqrt), so the two arms are
    * bit-identical — asserted in SimilaritySpec. */
  def scorePairsJoin(pairs: DataFrame, emb: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    val vecs = emb.select(col(idCol).cast("long").as("_vid"), col(vecCol).as("_v"))
    val joined = pairs.select(col("qid").cast("long"), col("pid").cast("long"))
      .join(vecs.select(col("_vid").as("qid"), col("_v").as("_qv")), "qid")
      .join(vecs.select(col("_vid").as("pid"), col("_v").as("_pv")), "pid")
      .select(col("qid"), col("pid"), col("_qv"), col("_pv"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cos", org.apache.spark.sql.types.DoubleType)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    joined.mapPartitions { it =>
      it.map { r =>
        val q = r.getLong(0)
        val p = r.getLong(1)
        val qv = r.getSeq[Float](2).toArray
        val pv = r.getSeq[Float](3).toArray
        var d = 0.0; var qs = 0.0; var ps = 0.0
        var i = 0
        while (i < qv.length) {
          d += qv(i).toDouble * pv(i).toDouble
          i += 1
        }
        i = 0
        while (i < qv.length) { qs += qv(i).toDouble * qv(i).toDouble; i += 1 }
        i = 0
        while (i < pv.length) { ps += pv(i).toDouble * pv(i).toDouble; i += 1 }
        Row(q, p, d / (math.sqrt(qs) * math.sqrt(ps)))
      }
    }
  }

  /** Exact cosine for candidate (qid, pid) pairs via a broadcast id→vector
    * map and a primitive JVM fold — bit-identical to [[dot]]/[[norm]] (same
    * left-to-right IEEE754 accumulation over the same doubles), ~50× faster
    * than evaluating the `zip_with`/`aggregate` HOF per pair. Driver-memory
    * bound by construction — only [[scorePairs]] should call it, which
    * routes anything past [[BroadcastVecBytes]] to [[scorePairsJoin]]. */
  def scorePairsBroadcast(pairs: DataFrame, emb: DataFrame, idCol: String,
                          vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    val vecs = emb.select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val bc = spark.sparkContext.broadcast(vecs.toMap)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cos", org.apache.spark.sql.types.DoubleType)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    pairs.select(col("qid").cast("long"), col("pid").cast("long")).mapPartitions { it =>
      val m = bc.value
      val norms = new java.util.HashMap[Long, java.lang.Double]()
      def normOf(id: Long): Double = {
        val cached = norms.get(id)
        if (cached != null) cached.doubleValue()
        else {
          val v = m(id)
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          val n = math.sqrt(s); norms.put(id, n); n
        }
      }
      it.map { r =>
        val (q, p) = (r.getLong(0), r.getLong(1))
        val (qv, pv) = (m(q), m(p))
        var s = 0.0; var i = 0
        while (i < qv.length) { s += qv(i).toDouble * pv(i).toDouble; i += 1 }
        Row(q, p, s / (normOf(q) * normOf(p)))
      }
    }
  }

  /** Brute-force cosine top-k with the plan auto-selected from the vector
    * table's Catalyst size estimate, exactly like [[scorePairs]]: a
    * dim-table-sized corpus takes the zero-shuffle broadcast arm
    * ([[cosineTopKBroadcast]]); anything bigger runs the fully distributed
    * self-join formulation ([[cosineTopK]]), which never collects. The two
    * arms are bit-identical (same left-to-right IEEE754 folds over the
    * same doubles — asserted in SimilaritySpec), so the selection is a
    * pure plan choice. */
  def cosineTopKAuto(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                     blockCol: Option[String] = None): DataFrame = {
    val threshold = emb.sparkSession.conf
      .get("graft.similarity.broadcastBytes", BroadcastVecBytes.toString).toLong
    val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= BigInt(threshold)) cosineTopKBroadcast(emb, idCol, vecCol, k, blockCol)
    else cosineTopK(emb, idCol, vecCol, k, blockCol)
  }

  /** Brute-force cosine top-k with the block side broadcast — identical
    * output to [[cosineTopK]] (asserted in the spec) with zero shuffles:
    * scan → per-row scan of the broadcast block → local top-k. Driver-
    * memory bound by construction (collects the vector table) — only
    * [[cosineTopKAuto]] should call it, which routes anything past
    * [[BroadcastVecBytes]] to the distributed formulation. */
  def cosineTopKBroadcast(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                          blockCol: Option[String] = None): DataFrame = {
    val spark = emb.sparkSession
    val selCols = Seq(col(idCol).cast("long").as("id"), col(vecCol).as("v")) ++
      blockCol.map(c => col(c).cast("string").as("blk"))
    val sel = emb.select(selCols: _*)
    val grouped = sel.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        if (blockCol.isDefined) r.getString(2) else ""))
      .groupBy(_._3)
      .map { case (blk, rows) =>
        blk -> rows.map { case (id, v, _) =>
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          (id, v, math.sqrt(s))
        }
      }
    val bc = spark.sparkContext.broadcast(grouped)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rnk", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cos", org.apache.spark.sql.types.DoubleType)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    sel.mapPartitions { it =>
      val groups = bc.value
      it.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1).toArray
        val blk = if (r.length > 2) r.getString(2) else ""
        var s = 0.0; var i = 0
        while (i < qv.length) { s += qv(i).toDouble * qv(i).toDouble; i += 1 }
        val qn = math.sqrt(s)
        val cands = groups(blk)
        val scored = cands.iterator.filter(_._1 != qid).map { case (pid, pv, pn) =>
          var d = 0.0; var j = 0
          while (j < qv.length) { d += qv(j).toDouble * pv(j).toDouble; j += 1 }
          (d / (qn * pn), pid)
        }.toArray
        java.util.Arrays.sort(scored, Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long]))
        scored.iterator.take(k).zipWithIndex.map { case ((cos, pid), rk) =>
          Row(qid, rk + 1, pid, cos)
        }
      }
    }
  }
}
