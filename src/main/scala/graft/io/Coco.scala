package graft.io

import graft.model.{CocoAnnotation, CocoCategory, CocoImage}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** COCO dataset codecs (SURVEY.md S1/S2).
  *
  * Read: `spark.read.option("multiLine", true).json` with an explicit schema
  * + explode into typed Datasets — schema-on-read happens only at this
  * boundary (§1.5).
  *
  * Write: entity rows are rendered distributed via `to_json(struct(...))`;
  * the single-document envelope (reference `coco_json.toJSON`, coco.py:32-37)
  * is assembled on the driver — correct for the reference's one-file
  * contract; at fleet scale use `writeJsonl` (per-entity JSONL shards). */
object Coco {

  case class CocoTables(images: Dataset[CocoImage], annotations: Dataset[CocoAnnotation],
      categories: Dataset[CocoCategory])

  val cocoSchema: StructType = StructType(Seq(
    StructField("images", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("file_name", StringType),
      StructField("height", IntegerType), StructField("width", IntegerType),
      StructField("license", IntegerType))))),
    StructField("annotations", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("image_id", LongType),
      StructField("category_id", IntegerType),
      StructField("segmentation", ArrayType(DoubleType)),
      StructField("bbox", ArrayType(DoubleType)),
      StructField("area", DoubleType), StructField("iscrowd", IntegerType))))),
    StructField("categories", ArrayType(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("supercategory", StringType))))),
    StructField("type", StringType)))

  def read(spark: SparkSession, path: String): CocoTables = {
    import spark.implicits._
    val raw = spark.read.option("multiLine", true).schema(cocoSchema).json(path)
    val images = raw.select(explode(col("images")).as("i"))
      .select(col("i.id"), col("i.file_name").as("fileName"), col("i.height"),
        col("i.width"), coalesce(col("i.license"), lit(1)).as("license"))
      .as[CocoImage]
    val anns = raw.select(explode(col("annotations")).as("a"))
      .select(col("a.id"), col("a.image_id").as("imageId"),
        col("a.category_id").as("categoryId"), col("a.segmentation"),
        col("a.bbox"), col("a.area"), coalesce(col("a.iscrowd"), lit(0)).as("iscrowd"))
      .as[CocoAnnotation]
    val cats = raw.select(explode(col("categories")).as("c"))
      .select(col("c.id"), col("c.name"), col("c.supercategory"))
      .as[CocoCategory]
    CocoTables(images, anns, cats)
  }

  private def imageJson(images: Dataset[CocoImage]): Dataset[String] = {
    import images.sparkSession.implicits._
    images.orderBy("id").select(to_json(struct(
      col("license"), col("fileName").as("file_name"), col("height"),
      col("width"), col("id")))).as[String]
  }

  private def annotationJson(anns: Dataset[CocoAnnotation]): Dataset[String] = {
    import anns.sparkSession.implicits._
    anns.orderBy("id").select(to_json(struct(
      col("segmentation"), col("area"), col("iscrowd"),
      col("imageId").as("image_id"), col("bbox"),
      col("categoryId").as("category_id"), col("id")))).as[String]
  }

  private def categoryJson(cats: Dataset[CocoCategory]): Dataset[String] = {
    import cats.sparkSession.implicits._
    cats.orderBy("id").select(to_json(struct(
      col("supercategory"), col("id"), col("name")))).as[String]
  }

  /** Single-document COCO JSON string (envelope keys per COCO_validator.py:
    * images, type, annotations, categories). */
  def toJsonDocument(t: CocoTables): String = {
    val img = imageJson(t.images).collect().mkString(",")
    val ann = annotationJson(t.annotations).collect().mkString(",")
    val cat = categoryJson(t.categories).collect().mkString(",")
    s"""{"images":[$img],"type":"instances","annotations":[$ann],"categories":[$cat]}"""
  }

  def write(t: CocoTables, path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJsonDocument(t))
  }

  /** Scale path: per-entity JSONL shards (one dir per collection). */
  def writeJsonl(t: CocoTables, dir: String): Unit = {
    imageJson(t.images).write.mode("overwrite").text(s"$dir/images")
    annotationJson(t.annotations).write.mode("overwrite").text(s"$dir/annotations")
    categoryJson(t.categories).write.mode("overwrite").text(s"$dir/categories")
  }
}
