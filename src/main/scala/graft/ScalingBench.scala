package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north_rule: throughput efficiency
  * ≥ 0.8 from N to 4N executors). No real cluster exists in this sandbox,
  * so per the driver's protocol the same job runs at local[8] (N) and
  * local[32] (4N) on the same input; efficiency = rows/s(32) / (4·rows/s(8)).
  *
  * Protocol notes (learned the hard way):
  *  - each measurement runs in a FRESH JVM — within one JVM, JIT/GC state
  *    makes second-session timings incomparable;
  *  - the input is materialized parquet (data at rest, like the real
  *    Common-Crawl table), so the measured job is scan → cell assignment →
  *    PIP join → aggregate, not in-memory generation;
  *  - the job must be large enough that fixed startup (~1s) is noise.
  *
  * The job itself lives in [[Flagship]] (shared with the driver-visible
  * [[Bench]]). Orchestrated by `tools/run_scaling.sh`. Modes:
  *   gen <nPages> <dir>              — materialize the feature table
  *   bench <cores> <dir> [variant]   — run the flagship, print one JSON line
  */
object ScalingBench {

  /** locale-proof formatting (the f-interpolator uses the default locale;
    * comma-decimal locales would corrupt the parsed JSON) */
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** SPARK_GRAFT_MASTER overrides the master — e.g.
    * `local-cluster[4,8,8192]` for multi-JVM executor emulation where each
    * "node" owns its own heap/GC/JIT (the closest this single VM gets to a
    * real N vs 4N executor cluster). Default stays in-process local[N]. */
  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]"))
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.host", "localhost")
    .getOrCreate()

  def main(args: Array[String]): Unit = args(0) match {
    case "gen" =>
      val (n, dir) = (args(1).toLong, args(2))
      val spark = session(32)
      spark.sparkContext.setLogLevel("WARN")
      Flagship.gen(spark, n, dir)
      println(s"""{"mode":"gen","pages":$n,"dir":"$dir"}""")
      spark.stop()

    // Exercise the DISTRIBUTED connected-components flooding arm at a
    // scale the gates never reach (the ≤2M-edge auto-select takes the
    // driver union-find arm there): chains of 101 nodes — diameter 100,
    // the shape that stresses pointer doubling — with nChains·100 edges.
    // Validates closed-form (one component per chain, labelled by the
    // chain's minimum node) and reports rounds + wall seconds.
    case "ccbench" =>
      val cores = args(1).toInt
      val nChains = if (args.length > 2) args(2).toLong else 40000L
      val spark = session(cores)
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions._
      val chainLen = 101L // nodes per chain → 100 edges per chain
      val edges = spark.range(0, nChains * (chainLen - 1), 1, cores)
        .select((col("id") / (chainLen - 1)).cast("long").as("c"),
          pmod(col("id"), lit(chainLen - 1)).as("o"))
        .select((col("c") * chainLen + col("o")).as("a"),
          (col("c") * chainLen + col("o") + 1).as("b"))
      val t0 = System.nanoTime()
      val cc = graft.ops.Dedup.connectedComponents(edges, maxIter = 30,
        smallGraphMaxEdges = 0L) // force the distributed flooding arm
      val badLabels = cc.where(col("comp") =!= (col("id") - pmod(col("id"), lit(chainLen))))
        .count() // closed form: every node's component is its chain start
      val nComp = cc.select("comp").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = spark.conf.get("graft.cc.rounds", "-1")
      val ok = badLabels == 0 && nComp == nChains
      println(s"""{"mode":"ccbench","cores":$cores,"edges":${nChains * (chainLen - 1)},"chains":$nChains,"rounds":$rounds,"sec":${fmt(sec)},"components":$nComp,"bad_labels":$badLabels,"ok":$ok}""")
      spark.stop()

    // Quantized-vs-float AT-REST ablation (BENCH/BASELINE.md): the same
    // blocked brute-force cosine top-1 job reading (a) the float32
    // embedding table with the native float dot and (b) the SQ8 lake
    // layout (binary codes, one byte/dim) with the native byte dot.
    // Reports at-rest bytes and best-of-2 seconds per arm — the 4× size
    // win and the scan/score effect, end to end from parquet.
    case "quantbench" =>
      val cores = args(1).toInt
      val n = if (args.length > 2) args(2).toLong else 100000L
      val dim = if (args.length > 3) args(3).toInt else 128
      // block size sets the scan/compute balance: top-1 within a block is
      // O(rows²·dim) compute over O(rows·dim) scanned bytes, so huge blocks
      // drown the at-rest effect in dot products; ~256 rows/block keeps the
      // job scan-bound (the operating point where the layout matters)
      val rowsPerBlk = if (args.length > 4) args(4).toLong else 256L
      val nBlocks = math.max(1L, n / rowsPerBlk)
      val spark = session(cores)
      spark.sparkContext.setLogLevel("WARN")
      spark.conf.set("graft.similarity.broadcastBytes", "1") // distributed arms only
      import org.apache.spark.sql.functions._
      val base = s"target/benchdata/quant-$n-$dim-$rowsPerBlk"
      val (fDir, qDir, pDir) = (s"$base-float", s"$base-sq8", s"$base-pq")
      if (!new java.io.File(pDir).isDirectory) {
        // hash-noisy components so neither the float table nor the codes
        // compress below their information content (a smooth corpus would
        // flatter the at-rest ratio — real embeddings are noise-like)
        val emb = spark.range(0, n, 1, cores).select(
          col("id"),
          transform(sequence(lit(0), lit(dim - 1)), { d =>
            // two-stage different-modulus mix + xor-shift (a single LCG
            // leaves arithmetic strides the compressor finds; ANSI mode
            // forbids overflowing longs, so EVERY product is reduced below
            // 2^31 first — including the id*dim+d seed, which would
            // overflow the first multiply above n ~ 27M otherwise)
            val h0 = pmod(col("id") * dim + d, lit(2147483647L))
            val h1 = pmod(h0 * lit(2654435761L), lit(2147483647L))
            val h2 = h1.bitwiseXOR(shiftright(h1, 13))
            // final modulus ~2^24: enough distinct floats that parquet
            // cannot dictionary-encode the column (a small modulus lets the
            // float arm compress to ~2 bytes/value and fakes the ratio)
            val h3 = pmod(h2 * lit(48271L) + col("id"), lit(16777213L))
            ((h3.cast("double") / 8388606.5) - 1.0).cast("float")
          }).as("v"),
          pmod(col("id"), lit(nBlocks)).as("blk"))
        emb.write.mode("overwrite").parquet(fDir)
        graft.lake.Lake.writeQuantizedEmbeddings(
          spark.read.parquet(fDir), "id", "v", qDir, extraCols = Seq("blk"))
        graft.lake.Lake.writePqEmbeddings(
          spark.read.parquet(fDir), "id", "v", pDir, m = dim / 8, ksub = 16,
          extraCols = Seq("blk"))
      }
      // recursive so pq_bytes includes the _codebook sidecar — it is part
      // of the self-describing layout (ADVICE r05: top-level-only counting
      // slightly overstated the PQ at-rest ratio)
      def dirBytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) f.length()
          else 0L
        walk(new java.io.File(p))
      }
      val (pqDf, pqCb) = graft.lake.Lake.readPqEmbeddings(spark, pDir)
      def floatArm(): Long = graft.ops.Similarity.cosineTopK(
        spark.read.parquet(fDir), "id", "v", 1, Some("blk")).count()
      def quantArm(): Long = graft.ops.Quantize.annSq8FromCodes(
        spark.read.parquet(qDir), "id", "codes", 1, Some("blk")).count()
      // PQ arm scores with SDC — its layout-native mode (codes on both
      // sides, zero float IO); each arm runs the top-1-within-block job
      // with its layout's scoring kernel
      def pqArm(): Long = graft.ops.Quantize.annPqSdc(
        pqDf, pqCb, "id", "codes", 1, Some("blk")).count()
      floatArm(); quantArm(); pqArm() // warmup: codegen + page cache
      def best(job: () => Long): Double = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
      }.min
      val (fSec, qSec, pSec) =
        (best(() => floatArm()), best(() => quantArm()), best(() => pqArm()))
      val (fB, qB, pB) = (dirBytes(fDir), dirBytes(qDir), dirBytes(pDir))
      println(s"""{"mode":"quantbench","cores":$cores,"n":$n,"dim":$dim,"rows_per_block":$rowsPerBlk,"float_bytes":$fB,"sq8_bytes":$qB,"pq_bytes":$pB,"sq8_bytes_ratio":${fmt(fB.toDouble / qB)},"pq_bytes_ratio":${fmt(fB.toDouble / pB)},"float_sec":${fmt(fSec)},"sq8_sec":${fmt(qSec)},"pq_sec":${fmt(pSec)},"sq8_speedup":${fmt(fSec / qSec)},"pq_speedup":${fmt(fSec / pSec)}}""")
      spark.stop()

    case "bench" =>
      val (cores, dir) = (args(1).toInt, args(2))
      val variant = if (args.length > 3) args(3) else "jts"
      val trials = if (args.length > 4) args(4).toInt else 2
      val spark = session(cores)
      spark.sparkContext.setLogLevel("WARN")
      val rows = spark.read.parquet(dir).count()
      Flagship.run(spark, dir, variant) // warmup: codegen + page cache
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); Flagship.run(spark, dir, variant)
        (System.nanoTime() - t0) / 1e9
      }
      val best = secs.min
      println(s"""{"mode":"bench","cores":$cores,"variant":"$variant","rows":$rows,"sec":${fmt(best)},"rows_per_sec":${(rows / best).toLong}}""")
      spark.stop()
  }
}
