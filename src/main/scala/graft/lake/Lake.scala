package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Try

/** Iceberg-emulation table layer (SURVEY.md §4.6, S9, O9). No Iceberg jar
  * exists in the offline sandbox, so the engine provides the same contract
  * on plain parquet + JSON manifests, with the layout chosen so a real
  * Iceberg catalog can adopt the data files unchanged outside the sandbox:
  *
  * {{{
  *   <root>/<table>/data/snap-<id>/part-*.parquet   — immutable snapshot data
  *   <root>/<table>/_meta/snap-<id>.json            — manifest: rows, stats
  *   <root>/_lineage/                               — per-stage metrics rows
  *   <root>/_checkpoints/                           — completed-stage marks
  * }}}
  *
  * Capabilities the north_rule names:
  *  - snapshot append + time-travel read (`asOf`),
  *  - per-snapshot min/max column stats → snapshot pruning on read,
  *  - per-partition lineage metrics (rows/bytes) for every stage,
  *  - checkpointed, idempotent, resumable stages (`runStage` skips work whose
  *    snapshot already exists — the reference's resume() rescans output dirs,
  *    batch_geojson2coco.py:40-64).
  */
final class Lake(val root: String, spark: SparkSession) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaDir(table: String) = new Path(s"$root/$table/_meta")
  private def dataDir(table: String, snap: Long) = s"$root/$table/data/snap-$snap"

  // ---------- snapshots ----------

  def snapshotIds(table: String): Seq[Long] = {
    val dir = metaDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
        s.stripPrefix("snap-").stripSuffix(".json").toLong
      }.sorted.toSeq
  }

  /** Append `df` as a new immutable snapshot; records row count and min/max
    * stats for `statsCols` in the manifest. Returns the snapshot id. */
  def writeSnapshot(df: DataFrame, table: String, statsCols: Seq[String] = Seq.empty): Long = {
    val snap = snapshotIds(table).lastOption.getOrElse(-1L) + 1
    val dir = dataDir(table, snap)
    df.write.mode("errorifexists").parquet(dir)
    val written = spark.read.parquet(dir)
    val rows = written.count()
    // numeric stats are stored as JSON numbers and compared numerically at
    // prune time — a stringified compare would order "9" > "10" and
    // incorrectly skip matching snapshots (silently missing rows)
    val stats = statsCols.flatMap { c =>
      val numeric = written.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      val r = written.agg(min(col(c)).cast("string"), max(col(c)).cast("string")).head()
      if (r.isNullAt(0)) None else Some((c, r.getString(0), r.getString(1), numeric))
    }
    val statsJson = stats.map { case (c, lo, hi, numeric) =>
      if (numeric) s""""$c":{"min":$lo,"max":$hi,"num":true}"""
      else s""""$c":{"min":${jstr(lo)},"max":${jstr(hi)},"num":false}"""
    }.mkString("{", ",", "}")
    val manifest =
      s"""{"snapshot":$snap,"table":${jstr(table)},"rows":$rows,"stats":$statsJson}"""
    val out = fs.create(new Path(metaDir(table), s"snap-$snap.json"), false)
    out.write(manifest.getBytes("UTF-8")); out.close()
    snap
  }

  private def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def manifest(table: String, snap: Long): String = {
    val in = fs.open(new Path(metaDir(table), s"snap-$snap.json"))
    val bytes = org.apache.commons.io.IOUtils.toByteArray(in); in.close()
    new String(bytes, "UTF-8")
  }

  /** Read the table as of snapshot `asOf` (inclusive; default latest).
    * `prune` is an optional (col, lo, hi) predicate evaluated against the
    * manifests' min/max stats — snapshots that cannot match are never
    * scanned (the partition-pruning analog, SURVEY.md §4 J7). */
  def readTable(table: String, asOf: Long = Long.MaxValue,
                prune: Option[(String, String, String)] = None): DataFrame = {
    val snaps0 = snapshotIds(table).filter(_ <= asOf)
    val snaps = prune match {
      case None => snaps0
      case Some((c, lo, hi)) => snaps0.filter { s =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(manifest(table, s))
        val stat = if (root.has("stats")) root.get("stats").get(c) else null
        if (stat == null) true // no stats for the column → cannot prune
        else if (stat.get("num").asBoolean())
          stat.get("min").asDouble() <= hi.toDouble && stat.get("max").asDouble() >= lo.toDouble
        else stat.get("min").asText() <= hi && stat.get("max").asText() >= lo
      }
    }
    if (snaps.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(snaps.map(dataDir(table, _)): _*)
  }

  // ---------- lineage ----------

  /** Append per-partition metrics for a stage (north_rule lineage). */
  def recordLineage(jobId: String, stage: String, df: DataFrame): Unit = {
    import spark.implicits._
    val rowsPerPartition = df
      .groupBy(spark_partition_id().as("partitionId"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("jobId", lit(jobId))
      .withColumn("stage", lit(stage))
    rowsPerPartition.write.mode("append").parquet(s"$root/_lineage")
  }

  def lineage(): DataFrame =
    if (fs.exists(new Path(s"$root/_lineage"))) spark.read.parquet(s"$root/_lineage")
    else spark.emptyDataFrame

  // ---------- checkpoint / resume ----------

  def completedStages(jobId: String): Set[String] = {
    val p = new Path(s"$root/_checkpoints/$jobId")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet
  }

  def markComplete(jobId: String, stage: String): Unit =
    fs.create(new Path(s"$root/_checkpoints/$jobId/$stage"), true).close()

  /** Idempotent stage execution: if `stage` completed for `jobId`, read its
    * snapshot back instead of recomputing (kill-and-resume equivalence —
    * O9). The body must be deterministic for exact resume semantics. */
  def runStage(jobId: String, stage: String)(body: => DataFrame): DataFrame = {
    val table = s"$jobId/$stage"
    if (completedStages(jobId).contains(stage)) {
      readTable(table)
    } else {
      val df = body
      writeSnapshot(df, table)
      recordLineage(jobId, stage, df)
      markComplete(jobId, stage)
      readTable(table)
    }
  }
}

object Lake {
  /** Catalog-registered bucketed+sorted layout — the co-located-join story
    * for the fact tables at 100 TB: two tables bucketed the same way on the
    * join key sort-merge-join with NO shuffle exchange and NO sort on
    * either side (Spark reads its own bucket metadata; assert via
    * BucketedJoinSpec). Bucketing lives in the session catalog rather than
    * the snapshot layer because Spark only recognizes bucket files through
    * `saveAsTable` metadata — outside the sandbox an Iceberg catalog
    * supplies the same property through its bucket partition transform. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    key: String, sortCols: Seq[String] = Seq.empty): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** SQ8-quantized AT-REST layout for an embedding table: codes packed as
    * BINARY (one signed byte per dimension — the 4× size win is physical
    * parquet bytes, not an encoding artifact) plus the per-vector scale
    * AS DOUBLE — the exact value the codes were computed against, which
    * is all reconstruction needs (v̂_i = code_i · scale) and what keeps
    * the |v − v̂| ≤ scale/2 bound true (a float-rounded copy broke it).
    * Quantized cosine runs DIRECTLY off this layout
    * ([[graft.ops.Quantize.annSq8FromCodes]]) — scales cancel — so the
    * ANN scan/shuffle moves a quarter of the bytes; end-to-end scan+score
    * numbers vs the float table are in BENCH/BASELINE.md. */
  def writeQuantizedEmbeddings(emb: DataFrame, idCol: String, vecCol: String,
                               path: String,
                               extraCols: Seq[String] = Seq.empty): Unit = {
    // the scale is stored as DOUBLE: codes are computed against the exact
    // double scale, and a float-rounded copy shifts reconstruction by up
    // to ~127 ulp(scale) — past the |v − v̂| ≤ scale/2 bound for values
    // quantized at a cell boundary. 4 extra bytes/row is noise next to
    // the 4× payload win.
    val cols = Seq(col(idCol),
      graft.ops.Quantize.sq8Bytes(col(vecCol)).as("codes"),
      graft.ops.Quantize.sq8Scale(col(vecCol)).as("scale")) ++
      extraCols.map(col)
    emb.select(cols: _*).write.mode("overwrite").parquet(path)
  }

  /** Read the quantized layout back: (idCol, codes binary, scale double,
    * extras…) plus a reconstructed `vec_approx` array<double> column
    * (|v − v̂| ≤ scale/2 per dimension, the SQ8 distortion bound). */
  def readQuantizedEmbeddings(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn("vec_approx",
      transform(graft.ops.Quantize.bytesToCodes(col("codes")),
        c => c.cast("double") * col("scale").cast("double")))
  }

  /** The PQ at-rest layout — the compression tier beyond
    * [[writeQuantizedEmbeddings]]'s SQ8: each vector is product-quantized
    * ONCE at write time ([[graft.ops.Quantize.pqCodebooks]]'s
    * deterministic draw + argmin encode) and stored as m BINARY bytes —
    * 32× fewer payload bytes than float32 at D=64/m=8 (4·D → m). The m
    * codebooks (m·ksub·(D/m) floats — KBs) are persisted beside the data
    * under `_codebook/` (the underscore prefix hides the sidecar from
    * plain `spark.read.parquet(path)` readers, the `_SUCCESS`
    * convention), so the table is self-describing: reads need no access
    * to the original floats. Search straight off this layout is
    * [[graft.ops.Quantize.annPqSdc]] (both sides codes, zero float IO);
    * sizes and scan+score seconds vs float/SQ8 are measured in
    * `ScalingBench quantbench` (BENCH/BASELINE.md). */
  def writePqEmbeddings(emb: DataFrame, idCol: String, vecCol: String,
                        path: String, m: Int, ksub: Int,
                        extraCols: Seq[String] = Seq.empty): Unit = {
    val spark = emb.sparkSession
    // this layout packs one code per SIGNED byte — the storage-tier cap
    require(ksub <= 128,
      s"ksub=$ksub exceeds the signed-byte code range of the binary layout")
    val cb = graft.ops.Quantize.pqCodebooks(
      emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")), m, ksub)
    // native codegen'd encode projection (round 6 — same pqEncodeKernel,
    // no mapPartitions row codec; the scan→encode→write fuses into one
    // codegen stage)
    val quant = emb.select((Seq(col(idCol),
      graft.functions.AnnExprs.pqEncodeBytes(col(vecCol), cb).as("codes")) ++
      extraCols.map(col)): _*)
    quant.write.mode("overwrite").parquet(path)
    // codebook sidecar: one row per (subspace, entry), draw-rank ordered
    val cbRows = for (s <- cb.indices; j <- cb(s).indices)
      yield (s, j, cb(s)(j).toSeq)
    spark.createDataFrame(cbRows).toDF("s", "j", "entry")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_codebook")
  }

  /** Read the PQ layout back: the data frame (idCol, codes BINARY,
    * extras…) and the codebooks reassembled from the `_codebook` sidecar
    * in (subspace, draw-rank) order. */
  def readPqEmbeddings(spark: SparkSession,
                       path: String): (DataFrame, Array[Array[Array[Float]]]) = {
    val cbRows = spark.read.parquet(s"$path/_codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // self-describing-table contract (ADVICE r05): fail with a clear
    // message instead of an opaque empty-collection max
    require(cbRows.nonEmpty, s"no _codebook sidecar rows under $path")
    val m = cbRows.map(_._1).max + 1
    val cb = Array.tabulate(m) { s =>
      cbRows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    (spark.read.parquet(path), cb)
  }
}
