package graft.io

import graft.SparkSpec
import graft.io.Warc.WarcRecord
import org.apache.spark.sql.functions._

/** WARC/1.0 codec (ISO 28500): byte-exact round trips (plain and
  * per-record-gzip-member), header tolerance, truncation guard, and the
  * WARC → input_hint page-table path with the P20 extraction invariant. */
class WarcSpec extends SparkSpec {

  private def rec(i: Int, t: String = "response") = WarcRecord(
    t, s"https://example.org/p/$i", "2023-11-14T22:13:20Z",
    s"<urn:uuid:$i>", "application/http",
    s"<html><body><p>page $i</p></body></html>".getBytes("UTF-8"))

  test("plain write → parse round-trips every field and body byte") {
    val in = (0 until 5).map(rec(_))
    val out = Warc.parse(Warc.write(in))
    out should have size 5
    out.zip(in).foreach { case (g, w) =>
      g.warcType shouldBe w.warcType
      g.targetUri shouldBe w.targetUri
      g.date shouldBe w.date
      g.recordId shouldBe w.recordId
      g.contentType shouldBe w.contentType
      g.body shouldBe w.body
    }
  }

  test(".warc.gz round-trips through concatenated gzip members") {
    val in = (0 until 7).map(i => rec(i, if (i % 2 == 0) "response" else "request"))
    val gz = Warc.writeGz(in)
    Warc.isGzip(gz) shouldBe true
    val out = Warc.parse(gz)
    out.map(_.targetUri) shouldBe in.map(_.targetUri)
    out.map(_.body.toSeq) shouldBe in.map(_.body.toSeq)
  }

  test("bodies holding CRLF and WARC-like text don't confuse framing") {
    val tricky = rec(0).copy(body =
      "\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\n".getBytes("US-ASCII"))
    val out = Warc.parse(Warc.write(Seq(tricky, rec(1))))
    out should have size 2
    out(0).body shouldBe tricky.body
    out(1).targetUri shouldBe rec(1).targetUri
  }

  test("unknown headers are skipped; truncated bodies are rejected") {
    val extra = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-IP-Address: 10.0.0.1\r\n" +
      "WARC-Date: 2023-11-14T22:13:20Z\r\nWARC-Record-ID: <urn:uuid:9>\r\n" +
      "Content-Type: text/plain\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n")
      .getBytes("US-ASCII")
    Warc.parse(extra).head.body shouldBe "abc".getBytes("US-ASCII")
    val truncated = Warc.write(Seq(rec(0))).dropRight(10)
    an[IllegalArgumentException] should be thrownBy Warc.parse(truncated)
  }

  test("httpPayload strips the HTTP envelope byte-preservingly") {
    import spark.implicits._
    val html = "<html><body><p>hi</p></body></html>"
    val enveloped = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")
    // high bytes + an embedded blank line, NOT an HTTP message → untouched
    val binary = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', '\r', '\n',
      0xFF.toByte, 0x00, 0x7F)
    val plain = html.getBytes("UTF-8")
    val got = Seq(("a", enveloped), ("b", binary), ("c", plain))
      .toDF("k", "body")
      .select(col("k"), Warc.httpPayload(col("body")).as("p"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(got("a"), html.getBytes("UTF-8")))
    assert(java.util.Arrays.equals(got("b"), binary)) // bytes survive exactly
    assert(java.util.Arrays.equals(got("c"), plain))
  }

  test("records() parses per-partition and pages() lands the input_hint shape") {
    import spark.implicits._
    val files = (0 until 6).map { f =>
      val recs = (0 until 3).map(i => rec(f * 3 + i, if (i == 1) "request" else "response"))
      (s"f$f.warc" + (if (f % 2 == 0) ".gz" else ""),
        if (f % 2 == 0) Warc.writeGz(recs) else Warc.write(recs))
    }.toDF("path", "content").repartition(3)
    val recRows = Warc.records(files)
    recRows.count() shouldBe 18
    recRows.filter(col("warc_type") === "response").count() shouldBe 12
    val pages = Warc.pages(recRows)
    pages.columns.toSeq shouldBe Seq("url", "warc_ts", "html", "text", "lang")
    val r = pages.filter(col("url") === "https://example.org/p/0").head()
    r.getAs[java.sql.Timestamp]("warc_ts").toInstant.getEpochSecond shouldBe
      java.time.Instant.parse("2023-11-14T22:13:20Z").getEpochSecond
    // P20 invariant: the extraction chain recovers the embedded text
    r.getAs[String]("text") shouldBe "page 0"
  }
}
