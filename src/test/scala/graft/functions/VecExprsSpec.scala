package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Native codegen'd float-vector dot: bit parity with the HOF fold in
  * BOTH execution modes, and null/degenerate behavior. */
class VecExprsSpec extends SparkSpec {

  private lazy val vecs = {
    val spark2 = spark
    import spark2.implicits._
    (0 until 500).map { i =>
      val a = Array.tabulate(16)(d => math.sin(i * 16 + d + 1).toFloat)
      val b = Array.tabulate(16)(d => math.cos(i * 7 + d * 3).toFloat)
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
  }

  test("dotF is bit-identical to the aggregate/zip_with HOF fold") {
    val rows = vecs.select(col("id"),
        VecExprs.dotF(col("a"), col("b")).as("native"),
        Similarity.dot(col("a"), col("b")).as("hof"))
      .collect()
    rows.length shouldBe 500
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
  }

  test("interpreted eval matches generated code") {
    val on = vecs.select(VecExprs.dotF(col("a"), col("b"))).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = vecs.select(VecExprs.dotF(col("a"), col("b"))).collect().map(_.getDouble(0))
      on.zip(off).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("dotL matches the integer HOF fold in both eval modes") {
    val spark2 = spark
    import spark2.implicits._
    val codes = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 31 + d * 7) % 255 - 127).toLong),
        Array.tabulate(16)(d => ((i * 13 + d * 11) % 255 - 127).toLong))
    }.toDF("id", "a", "b")
    def hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val on = codes.select(VecExprs.dotL(col("a"), col("b")), hof).collect()
    on.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = codes.select(VecExprs.dotL(col("a"), col("b"))).collect().map(_.getLong(0))
      on.map(_.getLong(0)).zip(off).foreach { case (x, y) => assert(x == y) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null array yields null; empty arrays yield 0.0; normF matches") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (2L, None, Some(Array(3f, 4f))),
      (3L, Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VecExprs.dotF(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    got shouldBe Map(1L -> Some(11.0), 2L -> None, 3L -> Some(0.0))
    val n = df.where(col("id") === 1).select(VecExprs.normF(col("a"))).head().getDouble(0)
    n shouldBe math.sqrt(5.0)
  }

  test("length mismatch yields null (matching zip_with's null-padding), both modes") {
    val spark2 = spark
    import spark2.implicits._
    val f = Seq((1L, Array(1f, 2f, 3f), Array(1f, 2f))).toDF("id", "a", "b")
    val l = Seq((1L, Array(1L, 2L, 3L), Array(1L, 2L))).toDF("id", "a", "b")
    def hofF = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    def check(): Unit = {
      val rf = f.select(VecExprs.dotF(col("a"), col("b")), hofF).head()
      assert(rf.isNullAt(0) && rf.isNullAt(1)) // native == HOF twin
      assert(l.select(VecExprs.dotL(col("a"), col("b"))).head().isNullAt(0))
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
