package graft.queries

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity-search surface (builder brief): brute-force cosine
  * top-k baseline plus the banded multi-table SRP-LSH scale path, both with
  * exact DuckDB oracles. Exactness rests on two invariants proven in round
  * 1: (a) float×float products are exact in double, and (b) a left-to-right
  * double fold is bit-identical between Spark's `aggregate`/JVM loops and
  * DuckDB's `list_reduce` with explicit DOUBLE casts — identical
  * accumulation order → identical IEEE754 results → identical hashes. The
  * SRP plane components are pure integer hash-mixes, so bucket keys are
  * engine-portable too. */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val AnnBands = 8
  val AnnRowsPerBand = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // top-2 nearest neighbours by cosine within each label block — the
    // brute-force baseline, plan auto-selected from Catalyst size stats:
    // dim-table-sized input → broadcast block + JVM fold kernel (zero
    // shuffles); anything bigger → the distributed self-join formulation.
    // Both arms are bit-identical (SimilaritySpec), so the gate output
    // does not depend on which arm runs.
    "q30_ann_cosine" -> ((s, dir) => {
      Similarity.cosineTopKAuto(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          blockCol = Some("label"))
        .orderBy("qid", "rnk")
    }),

    // int8 scalar-quantized cosine top-k (FAISS SQ8 family): per-vector
    // symmetric scale, integer code dots, scales cancel in cosine — the
    // whole quantize→score→rank pipeline is exact integer + correctly-
    // rounded IEEE ops, so the oracle replays it bit-for-bit
    "q62_ann_sq8" -> ((s, dir) => {
      graft.ops.Quantize.annSq8(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          blockCol = Some("label"))
        .orderBy("qid", "rnk")
    }),

    // IVF-SQ8 (the FAISS composition a 100 TB embedding store runs):
    // sub-quadratic IVF candidate generation — hash-strided centroids,
    // exact-cosine list assignment, nProbe equi-join — over the 4×-smaller
    // SQ8-quantized corpus, scored with native integer dots. The oracle
    // replays centroid draw, assignment, quantization and integer ranking
    // end to end (the q41 oracle × the q62 oracle).
    "q63_ann_ivfsq8" -> ((s, dir) => {
      graft.ops.Quantize.annIvfSq8(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          nLists = 16, nProbe = 3)
        .orderBy("qid", "rnk")
    }),

    // IVF-SQ8 + exact rerank (FAISS refine): the quantized index proposes
    // top-4 candidates per query, exact float cosine re-ranks them to the
    // final top-2 — quantization error can swap near-ties, the refine
    // restores exact order within the candidate set. The oracle replays
    // the whole q63 pipeline ranked to 4, then the q41 exact-fold rerank.
    "q69_ann_ivfsq8_rerank" -> ((s, dir) => {
      graft.ops.Quantize.annIvfSq8Rerank(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          nLists = 16, nProbe = 3, rerankK = 4)
        .orderBy("qid", "rnk")
    }),

    // Product quantization + ADC (FAISS "PQ": the compression tier beyond
    // SQ8 — 64 floats become 8 codes against per-subspace codebooks, 32×
    // smaller in the join; queries stay float and score via an exact
    // m×ksub lookup table). Codebooks are the same deterministic
    // hash-strided draw as IVF, so the oracle replays draw → per-subspace
    // argmin encode → ADC distance → rank end to end.
    "q70_ann_pq" -> ((s, dir) => {
      graft.ops.Quantize.annPq(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          m = 8, ksub = 16, blockCol = Some("label"))
        .orderBy("qid", "rnk")
    }),

    // IVF-PQ (FAISS's flagship billion-scale index, by_residual=false):
    // IVF's coarse quantizer prunes candidates to the probed lists (the
    // same draw/assignment as q41/q63 — all three share list structure),
    // PQ-ADC scores the survivors over 8 codes per corpus vector. The
    // oracle is the q63 list-assignment prefix × the q70 encode/ADC.
    "q71_ann_ivfpq" -> ((s, dir) => {
      graft.ops.Quantize.annIvfPq(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          nLists = 16, nProbe = 3, m = 8, ksub = 16)
        .orderBy("qid", "rnk")
    }),

    // IVF-PQ + exact rerank — the full production ANN stack: list pruning
    // bounds candidates, PQ-ADC ranks them from m-byte codes, exact float
    // cosine re-ranks the quantized top-4 to the final top-2. The refine
    // matters most here: PQ's reconstruction error is the family's
    // coarsest, and the exact pass restores intra-cell order.
    "q72_ann_ivfpq_rerank" -> ((s, dir) => {
      graft.ops.Quantize.annIvfPqRerank(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          nLists = 16, nProbe = 3, m = 8, ksub = 16, rerankK = 4)
        .orderBy("qid", "rnk")
    }),

    // PQ-SDC (FAISS's all-quantized mode): BOTH sides are codes — the
    // shape of self-search over a PQ lake table where no float column
    // exists at all; distance = sum of centroid-pair subspace L2s looked
    // up in the m×ksub² SDC table (native codegen'd BytesSdcDist). The
    // oracle adds one centroid-pair distance CTE to the q70 encode replay.
    "q73_ann_pq_sdc" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val emb = t(s, dir, "embeddings")
      val cb = graft.ops.Quantize.pqCodebooks(
        emb.select(col("vec_id").cast("long").as("id"), col("embedding").as("v")),
        m = 8, ksub = 16)
      // encode to the at-rest byte layout in-query (the lake writer's
      // kernel, as a native codegen'd projection — round 6: the previous
      // Dataset.map paid the tuple row codec per vector), then search the
      // codes alone
      // evalBarrier: the self-join's streamed side would otherwise
      // re-encode per PAIR (whole-stage codegen defers the projection
      // into the join's match loop — see Quantize.evalBarrier)
      val quant = graft.ops.Quantize.evalBarrier(
        emb.select(col("vec_id").cast("long").as("vec_id"), col("label"),
          graft.functions.AnnExprs.pqEncodeBytes(col("embedding"), cb).as("codes")),
        "codes")
      graft.ops.Quantize.annPqSdc(quant, cb, "vec_id", "codes", 2, Some("label"))
        .orderBy("qid", "rnk")
    }),

    // the ANN scale path: banded multi-table SRP-LSH candidates (equi-join
    // on (band, bandkey) — never all-pairs), exact cosine re-rank of
    // candidates only. The oracle runs the identical algorithm in DuckDB.
    "q37_ann_lsh" -> ((s, dir) => {
      Similarity.annLshBanded(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          bands = AnnBands, rowsPerBand = AnnRowsPerBand)
        .orderBy("qid", "rnk")
    }),

    // embedding-cosine near-dup: exact threshold pairs within label blocks
    // (τ = 0.25, a binary-exact constant; cos values are bit-identical
    // across engines, so the >= comparison is too)
    "q40_embed_neardup" -> ((s, dir) => {
      graft.ops.Dedup.embeddingNearDup(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", tau = 0.25)
        .orderBy("a", "b")
    }),

    // the FULL embedding near-dup dedup pipeline, end-to-end: banded
    // SRP-LSH candidates → exact cosine ≥ τ → connected components →
    // keeper per group; the oracle replays every stage and closes the
    // edge set with a recursive CTE
    "q47_neardup_pipeline" -> ((s, dir) => {
      graft.ops.Dedup.nearDupGroups(t(s, dir, "embeddings"), "vec_id", "embedding",
          tau = 0.25, bands = AnnBands, rowsPerBand = AnnRowsPerBand)
        .withColumnRenamed("id", "vec_id")
        .withColumn("is_keeper", col("component") === col("vec_id"))
        .orderBy("vec_id")
    }),

    // IVF-Flat ANN: deterministic coarse quantizer (the 16 vectors with
    // the smallest (id·2654435761) mod (2^31−1) — a seeded hash-strided
    // sample, balanced on id-clustered data), nProbe=3 probed lists, exact
    // re-rank — the oracle runs the identical algorithm (same centroid
    // choice, same (cos desc, list asc) tie order, same folds) in DuckDB
    "q41_ann_ivf" -> ((s, dir) => {
      Similarity.annIvf(t(s, dir, "embeddings"), "vec_id", "embedding", 2,
          nLists = 16, nProbe = 3)
        .orderBy("qid", "rnk")
    })
  )

  /** Norm subquery shared by both oracles (bit-exact dot fold). */
  private val eSql =
    """e AS (SELECT vec_id, label, embedding,
         sqrt(list_reduce(list_transform(list_zip(embedding, embedding),
           l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)) AS n
         FROM embeddings)"""

  /** SRP plane component (p, i0) with i0 0-based — mirrors
    * Similarity.planeComponent exactly (DuckDB lambda index is 1-based,
    * hence the (i-1)). */
  private def projSql(p: Int): String =
    s"""list_reduce(list_transform(embedding, (x,i) -> CAST(x AS DOUBLE) *
       (CAST(($p*2654435761 + (i-1)*40503) % 1000 AS DOUBLE)/1000.0 - 0.5)),
       (x,y) -> x + y)"""

  private def bandKeySql(band: Int): String =
    (0 until AnnRowsPerBand).map { j =>
      s"(CASE WHEN ${projSql(band * AnnRowsPerBand + j)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  private val sigsSql = (0 until AnnBands).map { b =>
    s"SELECT vec_id, $b AS band, ${bandKeySql(b)} AS bkey FROM embeddings"
  }.mkString(" UNION ALL ")

  /** Shared q63/q69/q71 oracle prefix: IVF centroid draw → exact-cosine
    * list assignment (rn=1) + nProbe=3 query probes. */
  private val ivfAssignSql =
    s"""$eSql,
       c AS (SELECT vec_id, embedding, n,
           CAST(row_number() OVER (ORDER BY (vec_id*2654435761) % 2147483647, vec_id) - 1
             AS INTEGER) AS li
         FROM (SELECT * FROM e
               ORDER BY (vec_id*2654435761) % 2147483647, vec_id LIMIT 16)),
       sims AS (SELECT v.vec_id, c.li,
           list_reduce(list_transform(list_zip(v.embedding, c.embedding),
             l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
             / (v.n * c.n) AS cos
         FROM e v CROSS JOIN c),
       ranked AS (SELECT vec_id, li,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, li ASC) AS rn
         FROM sims),
       assign AS (SELECT vec_id AS pid, li AS list FROM ranked WHERE rn = 1),
       probes AS (SELECT vec_id AS qid, li AS list FROM ranked WHERE rn <= 3)"""

  /** Shared q63/q69 oracle prefix: [[ivfAssignSql]] → SQ8 quantization →
    * list equi-join → integer-scored quantized pairs (qid, pid, qdot, qn2). */
  private val ivfSq8PairsSql =
    s"""$ivfAssignSql,
       sc AS (SELECT vec_id,
           greatest(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS s, embedding
         FROM embeddings),
       ccd AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS cd
         FROM sc),
       nn AS (SELECT vec_id, cd,
           CAST(list_sum(list_transform(cd, x -> x * x)) AS BIGINT) AS qn
         FROM ccd),
       cand AS (SELECT p.qid, a.pid FROM probes p JOIN assign a
         ON a.list = p.list AND a.pid <> p.qid),
       pairs AS (SELECT cand.qid, cand.pid,
           CAST(list_sum(list_transform(list_zip(ca.cd, cb.cd),
             l -> l[1] * l[2])) AS BIGINT) AS qdot,
           ca.qn * cb.qn AS qn2
         FROM cand JOIN nn ca ON ca.vec_id = cand.qid
                   JOIN nn cb ON cb.vec_id = cand.pid)"""

  /** PQ gate geometry: 64-dim embeddings, 8 subspaces of 8 dims, 16
    * codebook entries per subspace. */
  private val PqM = 8
  private val PqDsub = 8
  private val PqKsub = 16

  /** corpus/codebook subspace slices as a UNION ALL (DuckDB list slicing
    * is 1-based inclusive) */
  private def pqSlicesSql(src: String, idCols: String, out: String): String =
    (0 until PqM).map { s =>
      s"SELECT $idCols, $s AS s, embedding[${s * PqDsub + 1}:${(s + 1) * PqDsub}] AS $out FROM $src"
    }.mkString(" UNION ALL ")

  /** Shared q70/q71 PQ oracle CTEs: codebook draw → subspace slices →
    * per-(vector, subspace, entry) L2 table `d2` → argmin encode `enc`.
    * (`cb` is the same 16-seed hash draw as [[ivfAssignSql]]'s `c`.) */
  private val pqEncSql =
    s"""cb AS (SELECT CAST(row_number() OVER (
             ORDER BY (vec_id*2654435761) % 2147483647, vec_id) - 1 AS INTEGER) AS li,
             embedding
           FROM (SELECT * FROM embeddings
                 ORDER BY (vec_id*2654435761) % 2147483647, vec_id LIMIT $PqKsub)),
         xs AS (${pqSlicesSql("embeddings", "vec_id, label", "xv")}),
         cs AS (${pqSlicesSql("cb", "li", "cv")}),
         d2 AS (SELECT x.vec_id, x.s, c.li,
             list_reduce(list_transform(list_zip(x.xv, c.cv),
               l -> (CAST(l[1] AS DOUBLE) - CAST(l[2] AS DOUBLE))
                  * (CAST(l[1] AS DOUBLE) - CAST(l[2] AS DOUBLE))),
               (a,b) -> a + b) AS dv
           FROM xs x JOIN cs c ON c.s = x.s),
         enc AS (SELECT vec_id, s, li AS code FROM
            (SELECT vec_id, s, li,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dv ASC, li ASC) AS rn
             FROM d2)
            WHERE rn = 1)"""

  /** ADC pair scoring shared by q70/q71/q72: per-pair terms from the
    * query's `d2` row at the corpus vector's code, folded in subspace
    * order into `pd(qid, pid, dist)`. Expects a CTE `pairs0(qid, pid)`
    * in scope. */
  private val pqAdcDistSql =
    s"""terms AS (SELECT p.qid, p.pid, ey.s, d.dv
           FROM pairs0 p
           JOIN enc ey ON ey.vec_id = p.pid
           JOIN d2 d ON d.vec_id = p.qid AND d.s = ey.s AND d.li = ey.code),
         pd AS (SELECT qid, pid,
             list_reduce(list(dv ORDER BY s), (a,b) -> a + b) AS dist
           FROM terms GROUP BY qid, pid)"""

  /** final ADC rank (q70/q71 tail) */
  private val pqAdcRankSql =
    s"""$pqAdcDistSql
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, dist FROM
           (SELECT qid, pid, dist,
              row_number() OVER (PARTITION BY qid ORDER BY dist ASC, pid ASC) AS rn
            FROM pd)
         WHERE rn <= 2 ORDER BY qid, rnk"""

  val oracleSql: Map[String, String] = Map(
    "q70_ann_pq" ->
      s"""WITH $pqEncSql,
         pairs0 AS (SELECT a.vec_id AS qid, b.vec_id AS pid
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         $pqAdcRankSql""",
    "q71_ann_ivfpq" ->
      s"""WITH $ivfAssignSql,
         $pqEncSql,
         pairs0 AS (SELECT p.qid, a.pid FROM probes p JOIN assign a
           ON a.list = p.list AND a.pid <> p.qid),
         $pqAdcRankSql""",
    "q73_ann_pq_sdc" ->
      s"""WITH $pqEncSql,
         cdt AS (SELECT a.s, a.li AS i, b.li AS j,
             list_reduce(list_transform(list_zip(a.cv, b.cv),
               l -> (CAST(l[1] AS DOUBLE) - CAST(l[2] AS DOUBLE))
                  * (CAST(l[1] AS DOUBLE) - CAST(l[2] AS DOUBLE))),
               (x,y) -> x + y) AS dv
           FROM cs a JOIN cs b ON a.s = b.s),
         pairs0 AS (SELECT a.vec_id AS qid, b.vec_id AS pid
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         terms AS (SELECT p.qid, p.pid, eq.s, t.dv
           FROM pairs0 p
           JOIN enc eq ON eq.vec_id = p.qid
           JOIN enc ep ON ep.vec_id = p.pid AND ep.s = eq.s
           JOIN cdt t ON t.s = eq.s AND t.i = eq.code AND t.j = ep.code),
         pd AS (SELECT qid, pid,
             list_reduce(list(dv ORDER BY s), (a,b) -> a + b) AS dist
           FROM terms GROUP BY qid, pid)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, dist FROM
           (SELECT qid, pid, dist,
              row_number() OVER (PARTITION BY qid ORDER BY dist ASC, pid ASC) AS rn
            FROM pd)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q72_ann_ivfpq_rerank" ->
      s"""WITH $ivfAssignSql,
         $pqEncSql,
         pairs0 AS (SELECT p.qid, a.pid FROM probes p JOIN assign a
           ON a.list = p.list AND a.pid <> p.qid),
         $pqAdcDistSql,
         qtop AS (SELECT qid, pid FROM (SELECT qid, pid,
             row_number() OVER (PARTITION BY qid ORDER BY dist ASC, pid ASC) AS rn
           FROM pd) WHERE rn <= 4),
         rescored AS (SELECT q.qid, q.pid,
             list_reduce(list_transform(list_zip(ea.embedding, eb.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (ea.n * eb.n) AS cos
           FROM qtop q JOIN e ea ON ea.vec_id = q.qid JOIN e eb ON eb.vec_id = q.pid)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, cos FROM
           (SELECT qid, pid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, pid ASC) AS rn
            FROM rescored)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q62_ann_sq8" ->
      s"""WITH q AS (SELECT vec_id, label, embedding,
             greatest(list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS s
           FROM embeddings),
         c AS (SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS cd
           FROM q),
         n AS (SELECT vec_id, label, cd,
             CAST(list_sum(list_transform(cd, x -> x * x)) AS BIGINT) AS qn
           FROM c),
         pairs AS (SELECT a.vec_id AS qid, b.vec_id AS pid,
             CAST(list_sum(list_transform(list_zip(a.cd, b.cd),
               l -> l[1] * l[2])) AS BIGINT) AS qdot,
             a.qn * b.qn AS qn2
           FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, qdot,
           CAST(qdot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE)) AS cos_q
         FROM (SELECT qid, pid, qdot, qn2,
             row_number() OVER (PARTITION BY qid
               ORDER BY CAST(qdot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE)) DESC,
                        pid ASC) AS rn
           FROM pairs)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q63_ann_ivfsq8" ->
      s"""WITH $ivfSq8PairsSql
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, qdot,
           CAST(qdot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE)) AS cos_q
         FROM (SELECT qid, pid, qdot, qn2,
             row_number() OVER (PARTITION BY qid
               ORDER BY CAST(qdot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE)) DESC,
                        pid ASC) AS rn
           FROM pairs)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q69_ann_ivfsq8_rerank" ->
      s"""WITH $ivfSq8PairsSql,
         qtop AS (SELECT qid, pid FROM (SELECT qid, pid,
             row_number() OVER (PARTITION BY qid
               ORDER BY CAST(qdot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE)) DESC,
                        pid ASC) AS rn
           FROM pairs) WHERE rn <= 4),
         rescored AS (SELECT q.qid, q.pid,
             list_reduce(list_transform(list_zip(ea.embedding, eb.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (ea.n * eb.n) AS cos
           FROM qtop q JOIN e ea ON ea.vec_id = q.qid JOIN e eb ON eb.vec_id = q.pid)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, cos FROM
           (SELECT qid, pid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, pid ASC) AS rn
            FROM rescored)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q30_ann_cosine" ->
      s"""WITH $eSql,
         pairs AS (SELECT a.vec_id AS qid, b.vec_id AS pid,
             list_reduce(list_transform(list_zip(a.embedding, b.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (a.n * b.n) AS cos
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, cos FROM
           (SELECT qid, pid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, pid ASC) AS rn
            FROM pairs)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q40_embed_neardup" ->
      s"""WITH $eSql
         SELECT a, b, cos FROM
           (SELECT a.vec_id AS a, b.vec_id AS b,
              list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
                / (a.n * b.n) AS cos
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         WHERE cos >= 0.25 ORDER BY a, b""",
    "q41_ann_ivf" ->
      s"""WITH $eSql,
         c AS (SELECT vec_id, embedding, n,
             CAST(row_number() OVER (ORDER BY (vec_id*2654435761) % 2147483647, vec_id) - 1
               AS INTEGER) AS li
           FROM (SELECT * FROM e
                 ORDER BY (vec_id*2654435761) % 2147483647, vec_id LIMIT 16)),
         sims AS (SELECT v.vec_id, c.li,
             list_reduce(list_transform(list_zip(v.embedding, c.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (v.n * c.n) AS cos
           FROM e v CROSS JOIN c),
         ranked AS (SELECT vec_id, li,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, li ASC) AS rn
           FROM sims),
         assign AS (SELECT vec_id AS pid, li AS list FROM ranked WHERE rn = 1),
         probes AS (SELECT vec_id AS qid, li AS list FROM ranked WHERE rn <= 3),
         cand AS (SELECT p.qid, a.pid FROM probes p JOIN assign a
           ON a.list = p.list AND a.pid <> p.qid),
         scored AS (SELECT cand.qid, cand.pid,
             list_reduce(list_transform(list_zip(ea.embedding, eb.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (ea.n * eb.n) AS cos
           FROM cand JOIN e ea ON ea.vec_id = cand.qid JOIN e eb ON eb.vec_id = cand.pid)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, cos FROM
           (SELECT qid, pid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, pid ASC) AS rn
            FROM scored)
         WHERE rn <= 2 ORDER BY qid, rnk""",
    "q47_neardup_pipeline" ->
      s"""WITH RECURSIVE $eSql,
         sigs AS ($sigsSql),
         cand AS (SELECT s1.vec_id AS a, s2.vec_id AS b FROM sigs s1 JOIN sigs s2
           ON s1.band = s2.band AND s1.bkey = s2.bkey AND s1.vec_id < s2.vec_id
           GROUP BY 1, 2),
         scored AS (SELECT cand.a, cand.b,
             list_reduce(list_transform(list_zip(ea.embedding, eb.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (ea.n * eb.n) AS cos
           FROM cand JOIN e ea ON ea.vec_id = cand.a JOIN e eb ON eb.vec_id = cand.b),
         ed AS (SELECT a, b FROM scored WHERE cos >= 0.25
           UNION SELECT b, a FROM scored WHERE cos >= 0.25),
         reach(id, r) AS (
           SELECT a AS id, a AS r FROM ed
           UNION
           SELECT ed.a, reach.r FROM ed JOIN reach ON reach.id = ed.b),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         SELECT em.vec_id, coalesce(c.component, em.vec_id) AS component,
           coalesce(c.component, em.vec_id) = em.vec_id AS is_keeper
         FROM embeddings em LEFT JOIN comp c ON c.id = em.vec_id
         ORDER BY em.vec_id""",
    "q37_ann_lsh" ->
      s"""WITH $eSql,
         sigs AS ($sigsSql),
         cand AS (SELECT s1.vec_id AS a, s2.vec_id AS b FROM sigs s1 JOIN sigs s2
           ON s1.band = s2.band AND s1.bkey = s2.bkey AND s1.vec_id < s2.vec_id
           GROUP BY 1, 2),
         directed AS (SELECT a AS qid, b AS pid FROM cand
           UNION ALL SELECT b, a FROM cand),
         scored AS (SELECT d.qid, d.pid,
             list_reduce(list_transform(list_zip(ea.embedding, eb.embedding),
               l -> CAST(l[1] AS DOUBLE) * CAST(l[2] AS DOUBLE)), (x,y) -> x + y)
               / (ea.n * eb.n) AS cos
           FROM directed d JOIN e ea ON ea.vec_id = d.qid JOIN e eb ON eb.vec_id = d.pid)
         SELECT qid, CAST(rn AS INTEGER) AS rnk, pid, cos FROM
           (SELECT qid, pid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, pid ASC) AS rn
            FROM scored)
         WHERE rn <= 2 ORDER BY qid, rnk"""
  )
}
