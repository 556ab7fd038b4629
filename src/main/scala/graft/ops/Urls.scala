package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for Common-Crawl-style page tables (BASELINE.json
  * `input_hint`: one row per (url, warc_ts, html, text, lang)). A crawl
  * dedups and partitions BY URL, so canonical form is the join/group key
  * everything else hangs off; these are pure column expressions (native
  * Catalyst functions + one higher-order filter — no UDFs), so they
  * pushdown/codegen like any builtin and cost one projection at 100 TB.
  *
  * Rules (RFC 3986 §6 syntax-based normalization + the crawl-standard
  * extras): lowercase scheme and host, strip the host's trailing dot,
  * drop default ports (http:80, https:443), drop the fragment, default
  * an empty path to "/", drop `utm_*` tracking parameters, and sort the
  * remaining query parameters bytewise so param order never splits a
  * group. No percent-decoding: that can change semantics ("%2F" vs "/");
  * byte-preserving rules only, per the reference invariant of
  * byte-identical text per url.
  */
object Urls {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** lowercased scheme ("" when the url has none) */
  def scheme(url: Column): Column = lower(regexp_extract(url, schemeRe, 1))

  /** lowercased host, trailing dot and port stripped */
  def host(url: Column): Column = {
    val authority = regexp_extract(regexp_replace(url, schemeRe, ""), "^([^/?#]*)", 1)
    regexp_replace(regexp_replace(lower(authority), ":[0-9]*$", ""), "\\.$", "")
  }

  /** explicit port as a string, "" when absent */
  def port(url: Column): Column = {
    val authority = regexp_extract(regexp_replace(url, schemeRe, ""), "^([^/?#]*)", 1)
    regexp_extract(authority, ":([0-9]+)$", 1)
  }

  /** full canonical form (see object doc for the rule set) */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val rest = regexp_replace(regexp_replace(url, schemeRe, ""), "#.*$", "")
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val h = regexp_replace(regexp_replace(lower(authority), ":[0-9]*$", ""), "\\.$", "")
    val p = regexp_extract(authority, ":([0-9]+)$", 1)
    val keepPort = (p =!= "") && !((sch === "http" && p === "80") ||
      (sch === "https" && p === "443"))
    val pathq = rest.substr(length(authority) + lit(1), length(rest))
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      x => x =!= "" && !x.startsWith("utm_")))
    concat(
      sch, lit("://"), h,
      when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
      path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** compound second-level labels under which a third label is required to
    * name a registrant (public-suffix-list heuristic subset; the full PSL
    * would ship as a broadcast lookup in production) */
  private val compoundSlds = Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** registered domain (eTLD+1 heuristic): last two host labels, or last
    * three when the second-to-last is a compound SLD like "co.uk" */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val three = n >= 3 && sld.isin(compoundSlds: _*)
    when(n <= 2, hostCol).otherwise(
      when(three,
        concat_ws(".", element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
        .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1))))
  }
}
