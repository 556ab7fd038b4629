package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization rules (RFC 3986 §6 syntax normalization + crawl
  * extras) on hand-picked edges beyond the q49 fixture grid. */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url"))).collect().map(_.getString(0)).toSeq
  }

  private def domain(hosts: String*): Seq[String] = {
    import spark.implicits._
    hosts.toDF("h").select(Urls.registeredDomain(col("h"))).collect().map(_.getString(0)).toSeq
  }

  test("scheme and host lowercase; path case preserved") {
    canon("HTTPS://WWW.Example.COM/Path/To?x=1") shouldBe
      Seq("https://www.example.com/Path/To?x=1")
  }

  test("default ports drop, non-default and cross-scheme ports stay") {
    canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "https://a.com:80/x", "http://a.com:8080/x") shouldBe Seq(
      "http://a.com/x", "https://a.com/x",
      "https://a.com:80/x", "http://a.com:8080/x")
  }

  test("fragment stripped, empty path becomes /") {
    canon("http://a.com#frag", "http://a.com?b=2#frag") shouldBe
      Seq("http://a.com/", "http://a.com/?b=2")
  }

  test("query params sort bytewise and utm_* noise drops") {
    canon(
      "http://a.com/p?zz=1&aa=2&utm_source=news&utm_campaign=x",
      "http://a.com/p?utm_source=only") shouldBe Seq(
      "http://a.com/p?aa=2&zz=1",
      "http://a.com/p")
  }

  test("trailing host dot strips; empty query segments drop") {
    canon("http://A.com./p?&a=1&&b=2&") shouldBe Seq("http://a.com/p?a=1&b=2")
  }

  test("registered domain: eTLD+1 under the bundled public-suffix snapshot") {
    domain("www.site.co.uk", "a.b.site.com", "site.com", "localhost",
      "deep.www.gov.au") shouldBe
      Seq("site.co.uk", "site.com", "site.com", "localhost", "www.gov.au")
  }

  test("registered domain: PSL private suffixes, wildcards, exceptions") {
    // private-section suffixes: each subdomain is its own registrant
    domain("alice.github.io", "www.alice.github.io", "b.blogspot.com",
      "bucket.s3.amazonaws.com") shouldBe
      Seq("alice.github.io", "alice.github.io", "b.blogspot.com",
        "bucket.s3.amazonaws.com")
    // country registries the old 7-label heuristic could not know
    domain("shop.example.com.au", "www.parliament.gov.uk", "x.ac.jp") shouldBe
      Seq("example.com.au", "parliament.gov.uk", "x.ac.jp")
    // wildcard rule *.ck (every 2nd-level label is a registry) with the
    // !www.ck exception (www.ck is itself registrable)
    domain("shop.foo.ck", "www.ck", "sub.www.ck") shouldBe
      Seq("shop.foo.ck", "www.ck", "www.ck")
    // default rule: unknown TLD is its own suffix; IPv4 passes through
    domain("a.b.unknowntld", "10.0.0.1") shouldBe
      Seq("b.unknowntld", "10.0.0.1")
  }

  test("percent-hex normalization uppercases triplets, never decodes") {
    import spark.implicits._
    def norm(urls: String*): Seq[String] =
      urls.toDF("url").select(Urls.normalizePercentHex(col("url")))
        .collect().map(_.getString(0)).toSeq
    norm("http://a.com/p%2fq%3Ax", "no-escapes", "trailing%", "%2f",
      "bad%zz%4aok") shouldBe
      Seq("http://a.com/p%2Fq%3Ax", "no-escapes", "trailing%", "%2F",
        "bad%zz%4Aok")
    // opt-in through canonicalize: groups merge; default leaves bytes alone
    Seq("http://a.com/p%2fq", "http://a.com/p%2Fq").toDF("url")
      .select(Urls.canonicalize(col("url"), normalizePctHex = true))
      .collect().map(_.getString(0)).distinct should have length 1
    Seq("http://a.com/p%2fq", "http://a.com/p%2Fq").toDF("url")
      .select(Urls.canonicalize(col("url")))
      .collect().map(_.getString(0)).distinct should have length 2
  }

  test("canonical form is idempotent") {
    val messy = Seq(
      "HTTP://A.Com.:80/x/y?b=2&a=1&utm_source=s#f",
      "https://B.ORG", "http://c.net:8080?z=0")
    val once = canon(messy: _*)
    canon(once: _*) shouldBe once
  }
}
