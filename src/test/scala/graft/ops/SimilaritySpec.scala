package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  /** deterministic clustered embeddings: 10 clusters × 20 members, member =
    * cluster base + small deterministic perturbation. */
  lazy val emb = {
    val spark2 = spark
    import spark2.implicits._
    (0 until 200).map { i =>
      val c = i % 10
      val v = Array.tabulate(16) { d =>
        val base = math.sin(c * 16 + d + 1).toFloat
        val pert = (((i * 16 + d) * 2654435761L % 1000L) / 10000.0f) - 0.05f
        base + pert
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  def bruteTopK(k: Int): Map[Long, Seq[Long]] = {
    val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    rows.map { case (q, qv) =>
      val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
      q -> rows.filter(_._1 != q).map { case (p, pv) =>
        val dot = qv.zip(pv).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val pn = math.sqrt(pv.map(x => x.toDouble * x).sum)
        (p, dot / (qn * pn))
      }.sortBy { case (p, c) => (-c, p) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("cosineTopK matches brute force (ids and ranks)") {
    val got = Similarity.cosineTopK(emb, "vec_id", "embedding", 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val expect = bruteTopK(3)
    got.foreach { case (q, ids) => assert(ids == expect(q), s"query $q") }
    assert(got.size == 200)
  }

  test("annLsh recall@3 is high on clustered data") {
    val got = Similarity.annLsh(emb, "vec_id", "embedding", 3, nPlanes = 6)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val expect = bruteTopK(3)
    val recalls = expect.toSeq.map { case (q, ids) =>
      got.get(q).map(g => ids.count(g.contains).toDouble / ids.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.5, s"mean recall@3 = $recall")
  }

  test("cosineTopKBroadcast is bit-identical to the windowed column formulation") {
    val a = Similarity.cosineTopK(emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Similarity.cosineTopKBroadcast(emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("cosineTopKAuto routes by plan stats; both arms bit-identical") {
    def run() = Similarity.cosineTopKAuto(emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val broadcastArm = run() // tiny table → under the default threshold
    spark.conf.set("graft.similarity.broadcastBytes", "1")
    try {
      val distributedArm = run() // forced over the threshold → self-join arm
      assert(broadcastArm == distributedArm)
    } finally spark.conf.unset("graft.similarity.broadcastBytes")
  }

  test("annLshBanded recall@3 beats single-table at the same total planes") {
    val expect = bruteTopK(3)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rs = expect.toSeq.map { case (q, ids) =>
        got.get(q).map(g => ids.count(g.contains).toDouble / ids.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val banded = recallOf(Similarity.annLshBanded(emb, "vec_id", "embedding", 3,
      bands = 6, rowsPerBand = 4))
    val single = recallOf(Similarity.annLsh(emb, "vec_id", "embedding", 3, nPlanes = 24))
    assert(banded >= 0.9, s"banded recall@3 = $banded")
    assert(banded > single, s"OR-amplification should beat one 24-bit table: $banded vs $single")
  }

  test("annIvf recall@3 is high with a few probes on clustered data") {
    val expect = bruteTopK(3)
    val got = Similarity.annIvf(emb, "vec_id", "embedding", 3, nLists = 12, nProbe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = expect.toSeq.map { case (q, ids) =>
      got.get(q).map(g => ids.count(g.contains).toDouble / ids.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.8, s"ivf recall@3 = $recall")
    // candidates come only from probed lists — far fewer than all-pairs
    assert(got.values.map(_.size).sum <= 200 * 3)
  }

  test("k-means-refined IVF centroids: deterministic, recall >= raw seed draw") {
    val spark2 = spark
    import spark2.implicits._
    // clustered corpus with one dominant cluster: the hash-strided seed
    // draw lands mostly inside it, under-covering the small clusters —
    // the shape where Lloyd refinement actually moves centroids
    val data = (0 until 300).map { i =>
      val c = if (i % 10 < 7) 0 else 1 + i % 5
      val v = Array.tabulate(16)(d =>
        (math.cos(c * 16 + d) * 3.0 + math.sin(i * 16 + d) * 0.4).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(data, "vec_id", "embedding", 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    def recall(iters: Int): Double = {
      val got = Similarity.annIvf(data, "vec_id", "embedding", 3,
        nLists = 12, nProbe = 2, kmeansIters = iters)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rs = exact.toSeq.map { case (q, ids) =>
        got.get(q).map(g => ids.count(g.contains).toDouble / ids.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val (r0, r2) = (recall(0), recall(2))
    assert(r2 >= r0, s"refined recall $r2 < seed recall $r0")
    assert(r2 >= 0.8, s"refined recall $r2")
    // fixed-point reduction → exactly reproducible centroids across runs
    val e = data.select(col("vec_id").cast("long").as("id"),
      col("embedding").as("v"))
    val c1 = Similarity.ivfCentroids(e, 12, kmeansIters = 2).map(_._2.toSeq)
    val c2 = Similarity.ivfCentroids(e.repartition(7), 12, kmeansIters = 2).map(_._2.toSeq)
    c1 shouldBe c2
  }

  test("bandKeyKernel is bit-identical to the column-expression band key") {
    val fromCol = emb.select(col("vec_id"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .join(emb, "vec_id")
      .withColumn("bkey", Similarity.bandKeyCol(col("embedding"), col("band"), 6))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    for ((id, v) <- vecs; b <- 0 until 4) {
      assert(fromCol((id, b)) == Similarity.bandKeyKernel(v, b, 6), s"vec $id band $b")
    }
  }

  test("native srpKeys is bit-identical to kernel, HOF band key and HOF signature, both modes") {
    def check(): Unit = {
      val rows = emb.select(col("vec_id"), col("embedding"),
          graft.functions.VecExprs.srpKeys(col("embedding"), 4, 6).as("keys"),
          Similarity.srpSignature(col("embedding"), 10).as("sig"),
          Similarity.srpSignatureRef(col("embedding"), 10).as("sigref"))
        .collect()
      rows.length shouldBe 200
      rows.foreach { r =>
        val v = r.getSeq[Float](1).toArray
        val keys = r.getSeq[Long](2)
        (0 until 4).foreach { b =>
          assert(keys(b) == Similarity.bandKeyKernel(v, b, 6), s"band $b")
        }
        r.getLong(3) shouldBe r.getLong(4) // native signature == HOF twin
      }
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("scorePairsJoin is bit-identical to scorePairsBroadcast (the scale re-rank arm)") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = (0 until 200).flatMap(q => Seq(1, 7, 113).map(d => (q.toLong, ((q + d) % 200).toLong)))
      .toDF("qid", "pid")
    val viaJoin = Similarity.scorePairsJoin(pairs, emb, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val viaBc = Similarity.scorePairsBroadcast(pairs, emb, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(viaJoin.keySet == viaBc.keySet)
    viaJoin.foreach { case (k, c) =>
      assert(java.lang.Double.doubleToLongBits(c) ==
        java.lang.Double.doubleToLongBits(viaBc(k)), s"pair $k differs")
    }
  }

  test("annIvf list-size salt cap preserves output exactly (pure skew mitigation)") {
    val base = Similarity.annIvf(emb, "vec_id", "embedding", 3, nLists = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val salted = Similarity.annIvf(emb, "vec_id", "embedding", 3, nLists = 8, nProbe = 2,
        maxListSize = 7) // 200 vecs / 8 lists ⇒ every list salts into ≥4 sub-keys
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(salted == base)
  }

  test("dot/norm column functions match scala") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.norm(col("a")).as("n")).head
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == math.sqrt(14.0))
  }
}
