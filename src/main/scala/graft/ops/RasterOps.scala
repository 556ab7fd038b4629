package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raster payload column ops (SURVEY.md S7 — reference PNG conversion,
  * coco.py:140-169): band selection and grayscale averaging expressed as
  * higher-order functions over an `array<array<double>>` band-major payload
  * column. The reference's actual file IO (GeoTIFF→PNG) is a sink concern;
  * these are the data transformations it performs on the way. */
object RasterOps {

  /** First `n` bands (reference takes bands 1..3, coco.py:152). */
  def selectBands(bands: Column, n: Int): Column = slice(bands, 1, n)

  /** Grayscale = per-pixel mean of the first three bands
    * (reference `np.mean(data[0:3], axis=0)`, coco.py:158-160). */
  def grayscale(bands: Column): Column = {
    val b1 = element_at(bands, 1); val b2 = element_at(bands, 2)
    val b3 = element_at(bands, 3)
    transform(b1, (v, i) =>
      (v + element_at(b2, i + 1) + element_at(b3, i + 1)) / 3.0)
  }

  /** Per-band min/max/mean stats for lineage/QA manifests. */
  def bandStats(bands: Column): Column =
    transform(bands, b => struct(
      array_min(b).as("min"), array_max(b).as("max"),
      (aggregate(b, lit(0.0), (acc, v) => acc + v) / size(b)).as("mean")))
}
