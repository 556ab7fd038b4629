package graft.geo

import graft.{PropHelpers, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class AffineSpec extends SparkSpec with PropHelpers {

  val tf = Affine.northUp(west = 1000.0, north = 5000.0, pixelW = 2.0, pixelH = 2.0)

  test("round-trip law: world → floor pixel → back lands on pixel centre (coordinates.py:88,147)") {
    forAll(Gen.choose(0, 1999), Gen.choose(0, 1999), Gen.choose(0.0, 0.999), Gen.choose(0.0, 0.999)) {
      (c, r, fx, fy) =>
        // any world point strictly inside pixel (c, r)
        val x = 1000.0 + (c + fx) * 2.0
        val y = 5000.0 - (r + fy) * 2.0 - 1e-9
        val (row, col) = tf.worldToPixel(x, y)
        assert(col == c && row == r)
        val (cx, cy) = tf.pixelToWorld(col.toDouble, row.toDouble)
        assert(cx == 1000.0 + (c + 0.5) * 2.0)
        assert(cy == 5000.0 - (r + 0.5) * 2.0)
    }
  }

  test("integer-pixel centres round-trip exactly (in-bounds ints, property 5.3)") {
    forAll(Gen.choose(0L, 10000L), Gen.choose(0L, 10000L)) { (c, r) =>
      val (x, y) = tf.pixelToWorld(c.toDouble, r.toDouble)
      assert(tf.worldToPixel(x, y) == ((r, c)))
    }
  }

  test("forTile composes translation (tiles.py:82)") {
    val t = tf.forTile(100, 200)
    val (x0, y0) = tf.pixelToWorld(100.0 + 3, 200.0 + 4)
    val (x1, y1) = t.pixelToWorld(3.0, 4.0)
    assert(x0 == x1 && y0 == y1)
  }

  test("fromBounds matches rasterio semantics") {
    val t = Affine.fromBounds(0.0, 0.0, 100.0, 50.0, width = 200, height = 100)
    assert(t.a == 0.5 && t.e == -0.5 && t.c == 0.0 && t.f == 50.0)
    val (x, y) = t.pixelToWorldCorner(200.0, 100.0)
    assert(x == 100.0 && y == 0.0)
  }

  test("Column forms agree with pure Scala") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq.tabulate(300)(i => ((i * 37L) % 1500L, (i * 61L) % 1500L))
    val df = rows.toDF("c", "r")
      .withColumn("x", tf.pixelToWorldXCol(col("c"), col("r")))
      .withColumn("y", tf.pixelToWorldYCol(col("c"), col("r")))
      .withColumn("c2", tf.worldToColCol(col("x"), col("y")))
      .withColumn("r2", tf.worldToRowCol(col("x"), col("y")))
    df.select("c", "r", "x", "y", "c2", "r2").as[(Long, Long, Double, Double, Long, Long)]
      .collect().foreach { case (c, r, x, y, c2, r2) =>
        val (ex, ey) = tf.pixelToWorld(c.toDouble, r.toDouble)
        assert(x == ex && y == ey)
        assert(c2 == c && r2 == r)
      }
  }
}
