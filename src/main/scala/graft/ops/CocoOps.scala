package graft.ops

import graft.io.Coco
import graft.io.Coco.CocoTables
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** COCO dataset analytics: split (reference scripts/coco_split.py),
  * balance (scripts/coco_balance.py), and batch concatenation with global
  * re-indexing (scripts/batch_geojson2coco.py:366-489). SURVEY.md O2-O7,
  * A4-A8, J9/J10, A11. */
object CocoOps {

  // ---------- split (coco_split.py) ----------

  /** Random train/test split of images with annotation semi-joins (O2+J10).
    * Seeded and deterministic for a fixed partitioning of `images`. */
  def randomSplit(t: CocoTables, trainFraction: Double, seed: Long): (CocoTables, CocoTables) = {
    val Array(trainImgs, testImgs) =
      t.images.randomSplit(Array(trainFraction, 1 - trainFraction), seed)
    (subsetByImages(t, trainImgs), subsetByImages(t, testImgs))
  }

  /** Engine-portable deterministic split: hash of image id (reproducible on
    * any engine/partitioning, unlike randomSplit). */
  def hashSplit(t: CocoTables, trainPct: Int): (CocoTables, CocoTables) = {
    val spark = t.images.sparkSession
    import spark.implicits._
    val train = t.images.where(pmod(col("id") * 2654435761L, lit(100L)) < trainPct)
    val test = t.images.where(pmod(col("id") * 2654435761L, lit(100L)) >= trainPct)
    (subsetByImages(t, train), subsetByImages(t, test))
  }

  /** Stratified multilabel split approximation (O3): singleton-category
    * images dropped first (coco_split.py:100-108), then per-category
    * percent_rank over seeded rand. */
  def stratifiedSplit(t: CocoTables, trainFraction: Double, seed: Long): (CocoTables, CocoTables) = {
    val spark = t.images.sparkSession
    import spark.implicits._
    val catCounts = t.annotations.groupBy("categoryId").agg(count(lit(1)).as("n"))
    val nonSingleton = t.annotations.toDF()
      .join(broadcast(catCounts.where(col("n") > 1)), Seq("categoryId"), "left_semi")
    val imgCat = nonSingleton.select(col("imageId"), col("categoryId")).distinct()
    val w = Window.partitionBy("categoryId").orderBy(rand(seed))
    val ranked = imgCat.withColumn("pr", percent_rank().over(w))
      .join(broadcast(catCounts), "categoryId")
    // iterative stratification assigns by the rarest label first — greedy
    // approximation: each image follows the split slot of its least-frequent
    // category (tie: smallest id)
    val rarest = Window.partitionBy("imageId").orderBy(col("n").asc, col("categoryId").asc)
    val assign = ranked.withColumn("rk", row_number().over(rarest))
      .where(col("rk") === 1)
      .select(col("imageId"),
        when(col("pr") <= trainFraction, 1).otherwise(0).as("train"))
    val trainImgs = t.images.toDF().join(assign.where(col("train") === 1)
      .select(col("imageId").as("id")), Seq("id"), "left_semi").as[CocoImage]
    val testImgs = t.images.toDF().join(assign.where(col("train") === 0)
      .select(col("imageId").as("id")), Seq("id"), "left_semi").as[CocoImage]
    (subsetByImages(t, trainImgs), subsetByImages(t, testImgs))
  }

  /** EXACT port of the reference's multi-class split
    * (scripts/coco_split.py:110-137): iterative stratification (Sechidis
    * et al. 2011, the algorithm behind skmultilearn's
    * `iterative_train_test_split`) over ANNOTATION rows, one label per
    * annotation (`np.array([annotation_categories]).T`). Categories with
    * ≤1 annotation are removed first (the reference's "bottleneck 1" —
    * they cannot be split), each side's images are the ones its
    * annotations reference (reference `filter_images`), categories pass
    * through whole.
    *
    * The assignment loop is DRIVER-side over (annId, categoryId) pairs —
    * faithful to the reference's single-file contract and fine up to
    * ~10^8 annotations (12 bytes/row); at fleet scale use
    * [[stratifiedSplit]], the distributed greedy approximation.
    * Tie-breaks (equal desired counts) follow skmultilearn: a seeded
    * uniform pick, so a fixed seed is deterministic. */
  def iterativeStratifiedSplitExact(t: CocoTables, trainFraction: Double,
                                    seed: Long): (CocoTables, CocoTables) = {
    val spark = t.images.sparkSession
    import spark.implicits._
    val catCounts = t.annotations.groupBy("categoryId").agg(count(lit(1)).as("n"))
    val kept = t.annotations.toDF()
      .join(broadcast(catCounts.where(col("n") > 1)), Seq("categoryId"), "left_semi")
    val rows = kept.select(col("id").cast("long"), col("categoryId").cast("int"))
      .as[(Long, Int)].collect().sortBy(_._1)

    val ratios = Array(trainFraction, 1 - trainFraction)
    val nTotal = rows.length
    val desired = ratios.map(_ * nTotal) // c_j
    val perLabel = rows.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._1) }
    val desiredPerLabel = scala.collection.mutable.Map[Int, Array[Double]]()
    perLabel.foreach { case (c, ids) =>
      desiredPerLabel(c) = ratios.map(_ * ids.length)
    }
    val remaining = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    perLabel.foreach { case (c, ids) =>
      remaining(c) = scala.collection.mutable.ArrayBuffer(ids.sorted: _*)
    }
    val rnd = new scala.util.Random(seed)
    val trainIds = scala.collection.mutable.HashSet[Long]()
    while (remaining.values.exists(_.nonEmpty)) {
      // rarest label first (fewest remaining annotations; tie → smallest id)
      val (lbl, items) = remaining.filter(_._2.nonEmpty)
        .minBy { case (c, rs) => (rs.length, c) }
      val dl = desiredPerLabel(lbl)
      items.foreach { annId =>
        // subset with largest remaining label-desire; tie → largest total
        // desire; tie → seeded uniform pick (skmultilearn semantics)
        val bestByLabel = dl.indices.filter(j => dl(j) == dl.max)
        val pool =
          if (bestByLabel.length == 1) bestByLabel
          else {
            val dMax = bestByLabel.map(desired).max
            bestByLabel.filter(j => desired(j) == dMax)
          }
        val j = if (pool.length == 1) pool.head else pool(rnd.nextInt(pool.length))
        if (j == 0) trainIds += annId
        dl(j) -= 1
        desired(j) -= 1
      }
      items.clear()
    }
    // semi/anti joins against the assignment table (not a UDF over a
    // broadcast set): AQE broadcasts the id side while it fits and falls
    // back to a shuffle join beyond that
    val trainDf = spark.createDataset(trainIds.toSeq).toDF("id")
    def side(train: Boolean): CocoTables = {
      val anns = kept.join(trainDf, Seq("id"), if (train) "left_semi" else "left_anti")
        .select(t.annotations.columns.map(col).toIndexedSeq: _*).as[CocoAnnotation]
      val imgs = t.images.toDF()
        .join(anns.select(col("imageId").as("id")).distinct(), Seq("id"), "left_semi")
        .as[CocoImage]
      CocoTables(imgs, anns, t.categories, t.extras)
    }
    (side(train = true), side(train = false))
  }

  /** Keep only images in `imgs` and their annotations (J10 semi-joins). */
  def subsetByImages(t: CocoTables, imgs: Dataset[CocoImage]): CocoTables = {
    val spark = t.images.sparkSession
    import spark.implicits._
    val ids = imgs.select(col("id"))
    val anns = t.annotations.toDF()
      .join(ids.withColumnRenamed("id", "imageId"), Seq("imageId"), "left_semi")
      .select(t.annotations.columns.map(col).toIndexedSeq: _*).as[CocoAnnotation]
    CocoTables(imgs, anns, t.categories, t.extras)
  }

  // ---------- balance (coco_balance.py) ----------

  def countsPerCategory(t: CocoTables): DataFrame =
    t.annotations.groupBy("categoryId").agg(count(lit(1)).as("n")) // A4

  def pivotImageCategory(t: CocoTables): DataFrame = // A6
    t.annotations.groupBy("imageId").pivot("categoryId").count().na.fill(0)

  def imagesPerCategory(t: CocoTables): DataFrame = // A7
    t.annotations.groupBy("categoryId")
      .agg(collect_set(col("imageId")).as("image_ids"))

  /** Cap over-represented categories: subsample images of the most frequent
    * category down to `cap` images, drop the rest (O4 + J9 anti-join —
    * coco_balance.py:141-194 "bypass" mode). */
  def capCategory(t: CocoTables, categoryId: Int, cap: Int, seed: Long): CocoTables = {
    val spark = t.images.sparkSession
    import spark.implicits._
    val catImgs = t.annotations.where(col("categoryId") === categoryId)
      .select("imageId").distinct()
    val keep = catImgs.orderBy(pmod(col("imageId") * (seed * 2 + 1), lit(1000003L)), col("imageId"))
      .limit(cap)
    val drop = catImgs.join(keep, Seq("imageId"), "left_anti")
    val imgs = t.images.toDF()
      .join(drop.withColumnRenamed("imageId", "id"), Seq("id"), "left_anti")
      .select(t.images.columns.map(col).toIndexedSeq: _*).as[CocoImage]
    subsetByImages(t, imgs)
  }

  /** Roboflow path rewrite (P18, batch_geojson2coco.py:504-508): the
    * reference string-replaces `/tile_` → `_tile_` in the raw JSON text;
    * here it is a structured column transform on `fileName`. */
  def roboflowify(t: CocoTables): CocoTables = {
    val spark = t.images.sparkSession
    import spark.implicits._
    val imgs = t.images.toDF()
      .withColumn("fileName", regexp_replace(col("fileName"), "/tile_", "_tile_"))
      .as[CocoImage]
    CocoTables(imgs, t.annotations, t.categories, t.extras)
  }

  // ---------- concat with global re-indexing (batch_geojson2coco.py) ----------

  /** Concatenate datasets with dense global ids (A11 prefix-sum shifts, no
    * sequential driver loop) and category dedup-by-name with id remap (O7).
    * File names get the reference's `{i}_` prefix (batch_geojson2coco.py:394).
    */
  def concat(parts: Seq[CocoTables]): CocoTables = {
    require(parts.nonEmpty)
    val spark = parts.head.images.sparkSession
    import spark.implicits._

    // per-dataset counts → offsets (counts are tiny metadata; shift columns
    // keep id assignment fully distributed)
    val imgCounts = parts.map(_.images.count())
    val annCounts = parts.map(_.annotations.count())
    val imgOff = imgCounts.scanLeft(0L)(_ + _)
    val annOff = annCounts.scanLeft(0L)(_ + _)

    val images = parts.zipWithIndex.map { case (p, i) =>
      p.images.toDF()
        .withColumn("id", col("id") + imgOff(i))
        .withColumn("fileName", concat_ws("", lit(s"${i}_"), col("fileName")))
    }.reduce(_ unionByName _).as[CocoImage]

    // categories: dedup by name keeping the first dataset's id ordering
    val allCats = parts.zipWithIndex.map { case (p, i) =>
      p.categories.toDF().withColumn("ds", lit(i))
    }.reduce(_ unionByName _)
    val catByName = allCats
      .groupBy("name").agg(min(struct(col("ds"), col("id"))).as("first"),
        first(col("supercategory")).as("supercategory"))
      .withColumn("ds0", col("first.ds")).withColumn("id0", col("first.id"))
    // dense ids without a global window (categories are usually dim-sized,
    // but a no-partition row_number still single-partitions and warns)
    val newCats = Ids.denseId(catByName, "newId", Seq("ds0", "id0"))
      .withColumn("id", col("newId").cast("int"))
      .select(col("id"), col("name"), col("supercategory"))
    val catRemap = allCats.select(col("ds").as("rds"), col("id").as("oldId"), col("name"))
      .join(newCats.select(col("name"), col("id").as("newCatId")), "name")
      .select("rds", "oldId", "newCatId")

    val annotations = parts.zipWithIndex.map { case (p, i) =>
      p.annotations.toDF()
        .withColumn("id", col("id") + annOff(i))
        .withColumn("imageId", col("imageId") + imgOff(i))
        .withColumn("ds", lit(i))
    }.reduce(_ unionByName _)
      .join(broadcast(catRemap),
        col("ds") === col("rds") && col("categoryId") === col("oldId"))
      .drop("categoryId", "oldId", "rds", "ds")
      .withColumnRenamed("newCatId", "categoryId")
      .select("id", "imageId", "categoryId", "segmentation", "bbox", "area", "iscrowd")
      .as[CocoAnnotation]

    // envelope carry (batch_geojson2coco.py:464-476): "licenses" arrays are
    // concatenated across datasets; "info"/"type"/other keys last-wins (the
    // reference overwrites per iteration). Deviation noted: the reference
    // silently drops a singular "license" key (its try/except reads only
    // "licenses"); the engine carries it last-wins instead.
    val extras = parts.map(_.extras).reduce { (a, b) =>
      val mergedLicenses = (a.get("licenses"), b.get("licenses")) match {
        case (Some(x), Some(y)) =>
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          val arr = m.createArrayNode()
          Seq(x, y).foreach { s =>
            val n = m.readTree(s)
            if (n.isArray) arr.addAll(n.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode])
            else arr.add(n)
          }
          Map("licenses" -> m.writeValueAsString(arr))
        case _ => Map.empty[String, String]
      }
      a ++ b ++ mergedLicenses
    }

    CocoTables(images, annotations, newCats.as[CocoCategory], extras)
  }
}
