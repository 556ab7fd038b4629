package graft.ops

import graft.SparkSpec
import graft.io.Coco.CocoTables
import graft.model._

class CocoValidatorSpec extends SparkSpec {

  def tables(anns: Seq[CocoAnnotation]): CocoTables = {
    val spark2 = spark
    CocoTables(
      spark2.createDataset(Seq(CocoImage(0, "t.png", 10, 10)))(
        org.apache.spark.sql.Encoders.product[CocoImage]),
      spark2.createDataset(anns)(org.apache.spark.sql.Encoders.product[CocoAnnotation]),
      spark2.createDataset(Seq(CocoCategory(0, "a", "a")))(
        org.apache.spark.sql.Encoders.product[CocoCategory]))
  }

  val good = CocoAnnotation(0, 0, 0, Array(0.0, 0, 4, 0, 4, 2, 0, 2, 0, 0),
    Array(0.0, 0, 4, 2), 8.0)

  test("valid dataset passes all hard checks") {
    val v = CocoValidator.validate(tables(Seq(good)))
    assert(CocoValidator.isValid(v), v.toString)
    assert(v.strictAreaMismatch == 0) // axis-aligned rect: shoelace == w*h
  }

  test("violations are counted: orphan refs, bad bbox, dup ids, strict area") {
    val bad = Seq(
      good,
      good.copy(id = 1, imageId = 99),           // orphan image ref
      good.copy(id = 2, categoryId = 7),         // orphan category ref
      good.copy(id = 3, bbox = Array(1.0, 2.0)), // bbox len != 4
      good.copy(id = 3, iscrowd = 5),            // dup id + bad iscrowd
      good.copy(id = 4, segmentation = Array(0.0, 0, 4, 0, 2, 3),
        bbox = Array(0.0, 0, 4, 3), area = 6.0)  // triangle: area != w*h
    )
    val v = CocoValidator.validate(tables(bad))
    assert(!CocoValidator.isValid(v))
    assert(v.annotationsWithoutImage == 1)
    assert(v.annotationsWithoutCategory == 1)
    assert(v.badBboxLen == 1)
    assert(v.badIscrowd == 1)
    assert(v.duplicateAnnotationIds == 1)
    assert(v.strictAreaMismatch == 1)
  }
}
