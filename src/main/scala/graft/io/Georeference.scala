package graft.io

import graft.geo.Affine
import graft.model.RasterMeta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** jpeg2tiff georeferencing (reference scripts/jpeg2tiff.py:53-105,
  * SURVEY.md S11/P14/J5): match plain images to a bounds table by the
  * numeric prefix of their file name, build a `from_bounds` affine per
  * image, and emit raster metadata rows. Payload copy (the actual TIFF
  * write) is a sink concern; the metadata join + affine construction is the
  * data-processing part and lives here.
  */
object Georeference {

  /** P14 kernel: numeric-prefix id from the file base name
    * (jpeg2tiff.py:66-71) — pure built-in expressions, codegen'd. */
  def numericIdCol(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(element_at(split(path, "/"), -1), "^([0-9]+)", 1).cast("long")

  /** P13 kernel: tile name = file base name without extension
    * (coco2geojson.py:306-308). */
  def tileNameCol(fileName: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(split(fileName, "\\."), 1)

  /** `images`: (path:string, width:int, height:int) rows;
    * `bounds`: (id:long, west,south,east,north:double, crs:string).
    * Join key: leading digits of the file base name (jpeg2tiff.py:66-71). */
  def fromBoundsTable(images: DataFrame, bounds: DataFrame): DataFrame = {
    val withId = images.withColumn("id", numericIdCol(col("path")))
    withId.join(bounds, "id")
      .withColumn("a", (col("east") - col("west")) / col("width"))
      .withColumn("e", -(col("north") - col("south")) / col("height"))
      .select(col("path").as("rasterId"), col("width"), col("height"),
        col("a"), lit(0.0).as("b"), col("west").as("c"),
        lit(0.0).as("d"), col("e"), col("north").as("f"), col("crs"))
  }

  /** Typed form of one joined row (matches [[Affine.fromBounds]]). */
  def toRasterMeta(r: org.apache.spark.sql.Row): RasterMeta =
    RasterMeta(r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
      r.getDouble(8), r.getString(9))
}
