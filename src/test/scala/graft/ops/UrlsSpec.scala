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

  test("registered domain: eTLD+1 with compound SLD heuristic") {
    domain("www.site.co.uk", "a.b.site.com", "site.com", "localhost",
      "deep.www.gov.au") shouldBe
      Seq("site.co.uk", "site.com", "site.com", "localhost", "www.gov.au")
  }

  test("canonical form is idempotent") {
    val messy = Seq(
      "HTTP://A.Com.:80/x/y?b=2&a=1&utm_source=s#f",
      "https://B.ORG", "http://c.net:8080?z=0")
    val once = canon(messy: _*)
    canon(once: _*) shouldBe once
  }
}
