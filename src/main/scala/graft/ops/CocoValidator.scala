package graft.ops

import graft.io.Coco.CocoTables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COCO integrity validation (reference COCO_validator.py, SURVEY.md V1-V4)
  * as distributed checks returning violation counts instead of asserting on
  * the driver. Note the reference's own quirks, preserved as documented:
  * `area == bbox w·h` only holds for axis-aligned boxes (the writer uses
  * shoelace area — coco.py:259), so that check is a separate strict mode. */
object CocoValidator {

  final case class Violations(
      emptyCollections: Long,
      duplicateImageIds: Long, duplicateAnnotationIds: Long, duplicateCategoryIds: Long,
      annotationsWithoutImage: Long, annotationsWithoutCategory: Long,
      badBboxLen: Long, badIscrowd: Long, strictAreaMismatch: Long)

  def validate(t: CocoTables): Violations = {
    val imgs = t.images.toDF(); val anns = t.annotations.toDF(); val cats = t.categories.toDF()

    def dups(df: DataFrame, key: String): Long =
      df.groupBy(key).count().where(col("count") > 1).count()

    // V3 referential integrity via anti-joins
    val orphanImg = anns.join(imgs.select(col("id").as("imageId")), Seq("imageId"), "left_anti").count()
    val orphanCat = anns.join(cats.select(col("id").as("categoryId")), Seq("categoryId"), "left_anti").count()

    // V4 field-shape checks
    val badBbox = anns.where(size(col("bbox")) =!= 4).count()
    val badCrowd = anns.where(!col("iscrowd").isin(0, 1)).count()
    // try_element_at: malformed bboxes (caught by badBbox above) must not
    // abort the strict-area scan under ANSI mode
    val strictArea = anns.where(
      abs(col("area") - try_element_at(col("bbox"), lit(3)) *
        try_element_at(col("bbox"), lit(4))) > 1e-9).count()

    Violations(
      emptyCollections = Seq(imgs, anns, cats).count(_.isEmpty).toLong, // V1
      duplicateImageIds = dups(imgs, "id"),
      duplicateAnnotationIds = dups(anns, "id"),
      duplicateCategoryIds = dups(cats, "id"),
      annotationsWithoutImage = orphanImg,
      annotationsWithoutCategory = orphanCat,
      badBboxLen = badBbox,
      badIscrowd = badCrowd,
      strictAreaMismatch = strictArea)
  }

  /** True when the dataset passes the reference validator's hard checks
    * (strict area equality excluded — see class doc). */
  def isValid(v: Violations): Boolean =
    v.emptyCollections == 0 && v.duplicateImageIds == 0 &&
      v.duplicateAnnotationIds == 0 && v.duplicateCategoryIds == 0 &&
      v.annotationsWithoutImage == 0 && v.annotationsWithoutCategory == 0 &&
      v.badBboxLen == 0 && v.badIscrowd == 0
}
