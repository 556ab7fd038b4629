package graft.ops

import graft.SparkSpec
import graft.io.Coco.CocoTables
import graft.model._
import org.apache.spark.sql.functions._

class CocoOpsSpec extends SparkSpec {

  def mkTables(nImgs: Int, idOffset: Long = 0, catNames: Seq[String] = Seq("a", "b")): CocoTables = {
    val spark2 = spark
    import spark2.implicits._
    val imgs = (0 until nImgs).map(i => CocoImage(i.toLong, s"tile_$i.png", 10, 10))
    val anns = (0 until nImgs * 2).map { i =>
      CocoAnnotation(i.toLong, (i / 2).toLong, i % catNames.length,
        Array(0.0, 0, 1, 0, 1, 1, 0, 0), Array(0.0, 0, 1, 1), 0.5)
    }
    val cats = catNames.zipWithIndex.map { case (n, i) => CocoCategory(i, n, n) }
    CocoTables(spark.createDataset(imgs), spark.createDataset(anns),
      spark.createDataset(cats))
  }

  test("hashSplit partitions images disjointly and semi-joins annotations") {
    val t = mkTables(50)
    val (tr, te) = CocoOps.hashSplit(t, 80)
    val trIds = tr.images.collect().map(_.id).toSet
    val teIds = te.images.collect().map(_.id).toSet
    assert(trIds.intersect(teIds).isEmpty)
    assert(trIds.union(teIds).size == 50)
    val trAnnImgs = tr.annotations.collect().map(_.imageId).toSet
    assert(trAnnImgs.subsetOf(trIds))
    assert(tr.annotations.count() + te.annotations.count() == 100)
  }

  test("randomSplit is seeded-deterministic") {
    val t = mkTables(50)
    val (a1, _) = CocoOps.randomSplit(t, 0.7, seed = 42)
    val (a2, _) = CocoOps.randomSplit(t, 0.7, seed = 42)
    assert(a1.images.collect().map(_.id).toSet == a2.images.collect().map(_.id).toSet)
  }

  test("stratifiedSplit drops singleton categories and splits per class") {
    val spark2 = spark
    import spark2.implicits._
    val t = mkTables(40)
    // add a singleton category 'z' on image 0
    val anns2 = t.annotations.toDF()
      .unionByName(Seq((1000L, 0L, 2, Seq(0.0), Seq(0.0), 0.0, 0))
        .toDF("id", "imageId", "categoryId", "segmentation", "bbox", "area", "iscrowd"))
      .as[CocoAnnotation]
    val cats2 = t.categories.toDF()
      .unionByName(Seq((2, "z", "z")).toDF("id", "name", "supercategory"))
      .as[CocoCategory]
    val t2 = CocoTables(t.images, anns2, cats2)
    val (tr, te) = CocoOps.stratifiedSplit(t2, 0.5, seed = 7)
    val trN = tr.images.count(); val teN = te.images.count()
    assert(trN + teN == 40) // all images kept (none was singleton-only)
    assert(trN >= 14 && teN >= 14, s"imbalanced: $trN/$teN") // ~50/50 split
    // no annotation of category z should be required to survive both sides —
    // just check subset integrity
    assert(tr.annotations.toDF().join(tr.images.toDF().select(col("id").as("imageId")),
      Seq("imageId"), "left_anti").isEmpty)
  }

  test("iterativeStratifiedSplitExact: per-category counts within 1 of the desired ratio") {
    val spark2 = spark
    import spark2.implicits._
    // skewed label distribution: cat 0 ×60, cat 1 ×25, cat 2 ×9, cat 3 ×1 (dropped)
    val anns = (
      (0 until 60).map(i => (i.toLong, (i % 10).toLong, 0)) ++
      (0 until 25).map(i => (100L + i, (i % 10).toLong, 1)) ++
      (0 until 9).map(i => (200L + i, (i % 3).toLong, 2)) ++
      Seq((300L, 0L, 3))
    ).map { case (id, img, cat) =>
      CocoAnnotation(id, img, cat, Array(0.0, 0, 1, 0, 1, 1, 0, 0), Array(0.0, 0, 1, 1), 0.5)
    }
    val imgs = (0 until 10).map(i => CocoImage(i.toLong, s"t_$i.png", 10, 10))
    val cats = (0 until 4).map(i => CocoCategory(i, s"c$i", ""))
    val t = CocoTables(spark.createDataset(imgs), spark.createDataset(anns),
      spark.createDataset(cats))
    val (tr, te) = CocoOps.iterativeStratifiedSplitExact(t, 0.7, seed = 11)
    val trAnns = tr.annotations.collect()
    val teAnns = te.annotations.collect()
    // singleton category 3 dropped entirely (coco_split.py "bottleneck 1")
    assert(!(trAnns ++ teAnns).exists(_.categoryId == 3))
    assert(trAnns.map(_.id).toSet.intersect(teAnns.map(_.id).toSet).isEmpty)
    assert(trAnns.length + teAnns.length == 94)
    // iterative stratification keeps every label within 1 of its desired count
    for ((cat, total) <- Seq((0, 60), (1, 25), (2, 9))) {
      val got = trAnns.count(_.categoryId == cat)
      assert(math.abs(got - 0.7 * total) <= 1.0, s"cat $cat: $got of $total")
    }
    // each side's images are exactly the ones its annotations reference
    assert(tr.images.collect().map(_.id).toSet == trAnns.map(_.imageId).toSet)
    assert(te.images.collect().map(_.id).toSet == teAnns.map(_.imageId).toSet)
    // seeded determinism
    val (tr2, _) = CocoOps.iterativeStratifiedSplitExact(t, 0.7, seed = 11)
    assert(tr2.annotations.collect().map(_.id).toSet == trAnns.map(_.id).toSet)
  }

  test("capCategory subsamples the hot category's images (J9 anti-join)") {
    val t = mkTables(30)
    val capped = CocoOps.capCategory(t, categoryId = 0, cap = 5, seed = 1)
    val remainingCat0Imgs = capped.annotations.where(col("categoryId") === 0)
      .select("imageId").distinct().count()
    assert(remainingCat0Imgs == 5)
    // deterministic across reruns
    val again = CocoOps.capCategory(t, 0, 5, 1)
    assert(capped.images.collect().map(_.id).toSet == again.images.collect().map(_.id).toSet)
  }

  test("concat: dense global ids, file-name prefixes, category dedup by name (A11/O7)") {
    val t1 = mkTables(3, catNames = Seq("a", "b"))
    val t2 = mkTables(2, catNames = Seq("b", "c"))
    val all = CocoOps.concat(Seq(t1, t2))
    val imgs = all.images.collect().sortBy(_.id)
    assert(imgs.map(_.id).toSeq == (0L until 5L))
    assert(imgs.map(_.fileName).toSeq == Seq(
      "0_tile_0.png", "0_tile_1.png", "0_tile_2.png", "1_tile_0.png", "1_tile_1.png"))
    val cats = all.categories.collect().sortBy(_.id)
    assert(cats.map(c => (c.id, c.name)).toSeq == Seq((0, "a"), (1, "b"), (2, "c")))
    val anns = all.annotations.collect().sortBy(_.id)
    assert(anns.map(_.id).toSeq == (0L until 10L))
    // t2's category 0 was "b" → remapped to global id 1; t2's "c" → 2
    val t2anns = anns.filter(_.imageId >= 3)
    assert(t2anns.map(_.categoryId).toSet == Set(1, 2))
    // annotation↔image referential integrity holds
    assert(all.annotations.toDF().join(all.images.toDF().select(col("id").as("imageId")),
      Seq("imageId"), "left_anti").isEmpty)
  }
}
