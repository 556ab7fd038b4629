package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebPagesSpec extends SparkSpec {

  test("pages are deterministic and independent of partitioning") {
    val a = WebPages.pages(spark, 500, 2).orderBy("id").collect()
    val b = WebPages.pages(spark, 500, 16).orderBy("id").collect()
    assert(a.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getString(3) == y.getString(3))
      assert(java.util.Arrays.equals(x.getAs[Array[Byte]](2), y.getAs[Array[Byte]](2)))
    }
  }

  test("byte-identical extracted text per url (input_hint invariant, UDF-free path)") {
    val p = WebPages.pages(spark, 1000, 8)
    val bad = p.where(WebPages.extractedText(col("html")) =!= col("text"))
    assert(bad.isEmpty)
    // and the extraction is binary-exact, not just string-equal:
    val bad2 = p.where(encode(WebPages.extractedText(col("html")), "UTF-8") =!=
      encode(col("text"), "UTF-8"))
    assert(bad2.isEmpty)
  }

  test("features land inside the Unit20 world; 1-3 per page") {
    val f = WebPages.features(WebPages.pages(spark, 300, 4))
    assert(f.where(col("x") < 0 || col("x") >= 1048576 || col("y") < 0 || col("y") >= 1048576).isEmpty)
    val counts = f.groupBy("id").count().select("count").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(counts == Set(1L, 2L, 3L))
  }

  test("zones are inside the world with positive extent") {
    val z = WebPages.zones(spark, 64).collect()
    assert(z.length == 64)
    z.foreach { r =>
      assert(r.getDouble(1) >= 0 && r.getDouble(3) > r.getDouble(1))
      assert(r.getDouble(2) >= 0 && r.getDouble(4) > r.getDouble(2))
    }
  }
}
