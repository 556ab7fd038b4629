package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Directed cases for the two release-gate text passes: PII scrubbing and
  * paragraph-level dedup (both also oracle-gated, q56/q57). */
class PiiAndParaDedupSpec extends SparkSpec {

  private def redact(texts: String*): Seq[String] = {
    import spark.implicits._
    texts.toDF("t").select(TextAnalysis.redactPii(col("t")))
      .collect().map(_.getString(0)).toSeq
  }

  test("redactPii replaces every email, IP, and phone occurrence") {
    redact(
      "mail a.b-c@x.example.org or d@y.io today",
      "hosts 192.168.0.1 and 10.0.255.3",
      "call +49 30 1234 or +1 555-0100",
      "clean text stays untouched") shouldBe Seq(
      "mail <EMAIL> or <EMAIL> today",
      "hosts <IP> and <IP>",
      "call <PHONE> or <PHONE>",
      "clean text stays untouched")
  }

  test("email redaction runs before the IP pass (ordering contract)") {
    // a dotted-quad EMAIL HOST must disappear inside <EMAIL>, not get a
    // <IP> carved out of it; a bare dotted quad nearby still redacts
    redact("admin@10.0.0.1 from 10.0.0.2") shouldBe Seq("<EMAIL> from <IP>")
    redact("mail11@mail.example.com +33 12 2345") shouldBe Seq("<EMAIL> <PHONE>")
  }

  test("piiCounts match the planted occurrences") {
    import spark.implicits._
    val r = Seq("a@b.cc and c@d.ee at 10.0.0.1 tel +44 20 7946")
      .toDF("t")
      .select(TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((2L, 1L, 1L))
  }

  test("dedupParagraphs keeps only the globally-first occurrence, rebuilds in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A | B | C"),
      (2L, "B | D"), // B already seen in doc 1
      (3L, "C | C | E"), // C seen in doc 1; second C in-doc also dropped
      (4L, "A | B") // nothing new
    ).toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(docs, "doc_id", "text", " | ")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    got shouldBe Seq(
      (1L, "A | B | C", 3L),
      (2L, "D", 1L),
      (3L, "E", 1L),
      (4L, "", 0L))
  }
}
