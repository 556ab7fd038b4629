package graft.io

import graft.geo.{CellIndex, JtsGeo}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style web-page table — the
  * BASELINE.json `input_hint` shape `(url, warc_ts, html, text, lang)` —
  * generated from `spark.range` with pure column arithmetic (seeded by row
  * id; no randomness, no `Date.now`), so the same (n, shape) always yields
  * byte-identical rows on any cluster size. This satisfies the per-row
  * invariant "byte-identical extracted text per url": `text` is a pure
  * function of `url`'s id, and `html` embeds it such that the UDF-free
  * extraction chain `decode → regexp_replace` recovers it exactly
  * (SURVEY.md P20).
  */
object WebPages {

  val Words: Seq[String] = Seq(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "query", "row", "data",
    "slow", "filter", "customer", "line", "batch", "value", "spark",
    "group", "stream", "agg", "vector", "column", "tile", "zone",
    "cell", "page")

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** n pages, numPartitions-way parallel generation. */
  def pages(spark: SparkSession, n: Long, numPartitions: Int = 32): DataFrame = {
    val words = array(Words.map(lit): _*)
    spark.range(0, n, 1, numPartitions)
      .withColumn("url", concat(lit("https://example.org/p/"), col("id")))
      .withColumn("warc_ts", timestamp_seconds(lit(1700000000L) + col("id") % 2592000L))
      .withColumn("text", array_join(
        transform(sequence(lit(0L), lit(4L) + pmod(col("id"), lit(20L))),
          i => element_at(words,
            (pmod(col("id") * 7919L + i * 104729L, lit(32L)) + 1L).cast("int"))),
        " "))
      .withColumn("lang", element_at(array(Langs.map(lit): _*),
        (pmod(col("id"), lit(5L)) + 1L).cast("int")))
      .withColumn("html", encode(
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")), "UTF-8"))
      .select("url", "warc_ts", "html", "text", "lang", "id")
  }

  /** UDF-free text extraction from `html` (P20): decode + strip tags.
    * Byte-identical to the `text` column by construction; the invariant is
    * asserted in WebPagesSpec and exposed as a verify query. */
  def extractedText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(decode(html, "UTF-8"), "<[^>]*>", "")

  /** Per-page extracted geometry features: 1-3 points in the Unit20 world,
    * position a pure hash-mix of (page id, feature ordinal). */
  def features(pages: DataFrame): DataFrame =
    pages
      .withColumn("f", explode(sequence(lit(0L), pmod(col("id"), lit(3L)))))
      .select(
        col("url"), col("id"), col("f"),
        pmod(col("id") * 2654435761L + col("f") * 40503L, lit(1048576L))
          .cast("double").as("x"),
        pmod(col("id") * 2246822519L + col("f") * 65537L, lit(1048576L))
          .cast("double").as("y"))

  /** Bench-scale zone layer: like [[zones]] but with a size range chosen so
    * zones tile the world sparsely (~0.1-0.3 matches per point) — the
    * realistic tile-assignment shape; generated distributed. */
  def benchZones(spark: SparkSession, nZones: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.range(0, nZones, 1, math.max(1, nZones / 4096))
      .select(col("id").as("poly_id"),
        ((col("id") * 2654435761L + 12345L) % 1040000L).cast("double").as("xmin"),
        (((col("id") + 1000L) * 2246822519L + 54321L) % 1040000L).cast("double").as("ymin"))
      .withColumn("xmax", col("xmin") + (lit(2000L) + (col("poly_id") * 104729L) % 8000L).cast("double"))
      .withColumn("ymax", col("ymin") + (lit(2000L) + (col("poly_id") * 7919L) % 8000L).cast("double"))
  }

  /** Deterministic zone layer: `nZones` axis-aligned boxes over the Unit20
    * world, as both envelope columns and WKB polygons (`poly_id` = zone id). */
  def zones(spark: SparkSession, nZones: Int = 64): DataFrame = {
    import spark.implicits._
    (0 until nZones).map { b =>
      val xmin = ((b.toLong * 2654435761L + 12345L) % 950000L).toDouble
      val ymin = (((b.toLong + 1000L) * 2246822519L + 54321L) % 950000L).toDouble
      val w = (20000L + (b.toLong * 104729L) % 80000L).toDouble
      val h = (20000L + (b.toLong * 7919L) % 80000L).toDouble
      (b.toLong, xmin, ymin, xmin + w, ymin + h,
        JtsGeo.toWkb(JtsGeo.box(xmin, ymin, xmin + w, ymin + h)))
    }.toDF("poly_id", "xmin", "ymin", "xmax", "ymax", "wkb")
  }
}
