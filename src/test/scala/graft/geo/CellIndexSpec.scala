package graft.geo

import graft.{PropHelpers, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class CellIndexSpec extends SparkSpec with PropHelpers {
  import CellIndex._

  val coord: Gen[Long] = Gen.choose(0L, (1L << 28) - 1)
  val lvlGen: Gen[Int] = Gen.choose(0, 28)

  test("interleave round-trips col/row at any level") {
    forAll(coord, coord, lvlGen) { (c0, r0, lvl) =>
      val n = (1L << lvl) - 1
      val (c, r) = (c0 & n, r0 & n)
      val cell = pack(lvl, c, r)
      assert(levelOf(cell) == lvl && colDecode(cell) == c && rowDecode(cell) == r)
      assert(cell >= 0L)
    }
  }

  test("parent/children are inverse") {
    forAll(coord, coord, Gen.choose(1, 27)) { (c0, r0, lvl) =>
      val n = (1L << lvl) - 1
      val cell = pack(lvl, c0 & n, r0 & n)
      assert(children(parent(cell)).contains(cell))
      children(cell).foreach(ch => assert(parent(ch) == cell))
    }
  }

  test("z-order locality: parent id is a prefix relation") {
    // every child of a cell sorts within [cell<<2 interleave window]
    val cell = pack(5, 10, 21)
    val kids = children(cell)
    assert(kids.map(k => k & ((1L << 58) - 1)).forall { m =>
      (m >> 2) == (cell & ((1L << 58) - 1))
    })
  }

  test("encode matches manual grid arithmetic on the unit world") {
    val ci = CellIndex.Unit20
    forAll(Gen.choose(0L, 1048575L), Gen.choose(0L, 1048575L), Gen.choose(0, 20)) { (x, y, lvl) =>
      val shift = 20 - lvl
      assert(ci.colOf(x.toDouble, lvl) == (x >> shift))
      assert(ci.rowOf(y.toDouble, lvl) == (y >> shift))
      assert(ci.encode(x.toDouble, y.toDouble, lvl) == pack(lvl, x >> shift, y >> shift))
    }
  }

  test("cellsCovering contains the cell of every point of the envelope (property 5.3)") {
    val ci = CellIndex.WebMercator
    val g = Gen.choose(-2.0e7, 2.0e7)
    forAll(g, g, Gen.choose(0.0, 1e5), Gen.choose(0.0, 1e5), Gen.choose(4, 14)) {
      (x, y, w, h, lvl) =>
        val cover = ci.cellsCovering(x, y, x + w, y + h, lvl).toSet
        // corners + centre must be covered
        for ((px, py) <- Seq((x, y), (x + w, y), (x, y + h), (x + w, y + h), (x + w / 2, y + h / 2)))
          assert(cover.contains(ci.encode(px, py, lvl)))
    }
  }

  test("ring(k) has Chebyshev distance exactly k; disk is complete") {
    val ci = CellIndex.Unit20
    val cell = pack(10, 512, 300)
    for (k <- 0 to 3) {
      val r = ci.ring(cell, k)
      assert(r.nonEmpty)
      r.foreach { cc =>
        val d = math.max(math.abs(colDecode(cc) - 512), math.abs(rowDecode(cc) - 300))
        assert(d == k)
      }
      if (k > 0) assert(r.size == 8 * k) // interior cell, no clamping
    }
    assert(ci.disk(cell, 2).size == 25)
    // border clamp: corner cell ring-1 has only 3 neighbours
    assert(ci.ring(pack(10, 0, 0), 1).size == 3)
  }

  test("Column builders agree with pure Scala") {
    val ci = CellIndex.Unit20
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq.tabulate(200)(i => ((i * 7919L) % 1048576L, (i * 104729L) % 1048576L))
    val df = rows.toDF("x", "y")
      .withColumn("cell", ci.encodeCol(col("x").cast("double"), col("y").cast("double"), 12))
    val got = df.select("x", "y", "cell").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, cell) =>
      assert(cell == ci.encode(x.toDouble, y.toDouble, 12), s"($x,$y)")
    }
  }

  test("SQL emitter agrees with pure Scala (evaluated through Spark SQL)") {
    val rows = Seq.tabulate(100)(i => ((i * 7919L) % 4096L, (i * 104729L) % 4096L))
    val spark2 = spark
    import spark2.implicits._
    val df = rows.toDF("c", "r")
    df.createOrReplaceTempView("cr")
    val sql = s"select c, r, ${CellIndex.packSql(12, "c", "r")} as cell from cr"
    spark.sql(sql).as[(Long, Long, Long)].collect().foreach { case (c, r, cell) =>
      assert(cell == pack(12, c, r), s"($c,$r)")
    }
  }

  test("cellsCoveringCol agrees with pure Scala") {
    val ci = CellIndex.Unit20
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq.tabulate(60) { i =>
      val x = (i * 7919L) % 1000000L; val y = (i * 104729L) % 1000000L
      (x, y, x + (i * 131L) % 40000L, y + (i * 37L) % 40000L)
    }
    val df = rows.toDF("xmin", "ymin", "xmax", "ymax").withColumn("cover",
      ci.cellsCoveringCol(col("xmin").cast("double"), col("ymin").cast("double"),
        col("xmax").cast("double"), col("ymax").cast("double"), 8))
    df.select("xmin", "ymin", "xmax", "ymax", "cover").as[(Long, Long, Long, Long, Seq[Long])]
      .collect().foreach { case (x0, y0, x1, y1, cover) =>
        assert(cover == ci.cellsCovering(x0.toDouble, y0.toDouble, x1.toDouble, y1.toDouble, 8))
      }
  }
}
