package graft.model

/** Typed data model (SURVEY.md §1). Geometry travels as WKB bytes plus
  * envelope doubles (GeoParquet-style layout); COCO entities mirror the
  * reference's JSON shapes (coco.py:172-265). */

/** Raster georeferencing metadata — the only part of a GeoTIFF the engine
  * needs (reference opens rasters solely for transform/shape/crs/bounds,
  * coordinates.py:50-53, tiles.py:50). Affine: x = c + a·col + b·row,
  * y = f + d·col + e·row. */
final case class RasterMeta(
    rasterId: String, width: Int, height: Int,
    a: Double, b: Double, c: Double, d: Double, e: Double, f: Double,
    crs: String)

/** One tile of a raster's grid (reference tiles.py:16-83): pixel window +
  * shifted affine. `tileName` doubles as the join key, reference naming
  * `tile_{colOff}-{rowOff}` (tiles.py:122-124). */
final case class TileMeta(
    rasterId: String, tileName: String,
    colOff: Int, rowOff: Int, width: Int, height: Int,
    a: Double, b: Double, c: Double, d: Double, e: Double, f: Double)

/** Vector feature: WKB geometry + cached envelope + class attribution +
  * the full attribute table (SURVEY.md §1.2 — the reference carries every
  * GeoDataFrame property column through the pipeline; `props` preserves
  * them as strings so users can filter/group on any attribute). */
final case class Feature(
    featureId: Long, wkb: Array[Byte],
    xmin: Double, ymin: Double, xmax: Double, ymax: Double,
    zoneName: String, props: Map[String, String] = Map.empty)

final case class CocoImage(id: Long, fileName: String, height: Int, width: Int,
    license: Int = 1)

/** COCO annotation; `segmentation` is the flat [x1,y1,x2,y2,…] pixel ring
  * (flattened at coco.py:258), `bbox` = [minx,miny,w,h] (coco.py:234-239),
  * `area` = shoelace of the pixel ring (coco.py:259), NOT bbox w·h. */
final case class CocoAnnotation(
    id: Long, imageId: Long, categoryId: Int,
    segmentation: Array[Double], bbox: Array[Double], area: Double,
    iscrowd: Int = 0)

final case class CocoCategory(id: Int, name: String, supercategory: String)
