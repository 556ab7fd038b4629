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

  /** RFC 3986 §6.2.2.1 case normalization of percent-encodings: the hex
    * digits of every percent-triplet are uppercased (`%2f` → `%2F`), so
    * equivalent encodings stop splitting a dedup group. Byte-PRESERVING —
    * nothing is ever percent-DECODED (that can change semantics, e.g.
    * "%2F" vs "/"), which is why this is safe where decoding is not.
    * Pure native functions: split on '%', conditionally uppercase the
    * two-hex-digit head of each following piece, re-join. A '%' not
    * followed by two hex digits (invalid encoding) passes through
    * unchanged. */
  def normalizePercentHex(url: Column): Column = {
    val parts = split(url, "%", -1)
    val head = element_at(parts, 1)
    val rest = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(rest, p =>
      when(p.rlike("^[0-9a-fA-F]{2}"),
        concat(lit("%"), upper(p.substr(lit(1), lit(2))),
          p.substr(lit(3), length(p))))
        .otherwise(concat(lit("%"), p)))
    when(size(parts) <= 1, url)
      .otherwise(concat(head, array_join(fixed, "")))
  }

  /** [[canonicalize]] with explicit control over percent-encoding hex
    * normalization (opt OUT for a corpus whose existing keys were built
    * without it and must not move). */
  def canonicalize(url: Column, normalizePctHex: Boolean): Column =
    if (normalizePctHex) canonicalizeCore(normalizePercentHex(url))
    else canonicalizeCore(url)

  /** Full canonical form (see object doc for the rule set), INCLUDING
    * percent-hex case normalization — DEFAULT ON as of round 5. Decision
    * record: normalization is a pure function of the key, so the induced
    * url grouping is a coarsening — groups can only MERGE (two spellings
    * of one encoding), never split — and RFC 3986 §6.2.2.1 defines the
    * merged spellings as equivalent URIs. Measured corpus effect on the
    * gate corpora (q49 synthesis, q58 crawl, sf0.1 documents): zero keys
    * moved (no lowercase percent-triplets occur), so the flip is
    * behavior-preserving there while fixing real-crawl splits like
    * `%2f`-vs-`%2F`. UrlsSpec pins the merge-only property. */
  def canonicalize(url: Column): Column =
    canonicalizeCore(normalizePercentHex(url))

  private def canonicalizeCore(url: Column): Column = {
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

  /** Public-suffix snapshot (publicsuffix.org list format, bundled as a
    * resource — see src/main/resources/public_suffix_snapshot.dat): only
    * multi-label suffixes need listing because the PSL default rule makes
    * every unknown TLD its own suffix. Parsed once per JVM into
    * (exact suffixes, wildcard parents for `*.x` rules, `!` exceptions). */
  private lazy val (pslExact, pslWildcardParents, pslExceptions) = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/public_suffix_snapshot.dat"), "UTF-8")
    try {
      val lines = src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      (lines.filterNot(l => l.startsWith("*.") || l.startsWith("!")).toSet,
        lines.filter(_.startsWith("*.")).map(_.drop(2)).toSet,
        lines.filter(_.startsWith("!")).map(_.drop(1)).toSet)
    } finally src.close()
  }

  /** longest suffix (in labels) any snapshot rule can produce */
  private lazy val pslMaxLabels: Int =
    (pslExact.map(_.count(_ == '.') + 1) ++
      pslWildcardParents.map(_.count(_ == '.') + 2)).max

  /** Registered domain (eTLD+1) under the bundled public-suffix snapshot,
    * PSL algorithm: the registrable domain is the public suffix plus one
    * more label, where the MATCHING RULE IS THE LONGEST of (exact entries,
    * `*.parent` wildcards minus `!` exceptions, and the default rule that
    * any TLD is a suffix). Runs as the JVM expression
    * [[graft.functions.RegisteredDomain]] (rule sets as plain references):
    * the column-tower spelling below pushed whole-stage codegen past the
    * 64 KB method limit at the full ~1235-rule snapshot, dropping entire
    * stages to the interpreted path — the expression keeps the stage
    * codegen'd and interprets only this call. Bit-parity with the tower
    * asserted in UrlsSpec. A host that IS a public suffix (or a single
    * label, or an all-numeric IPv4 literal) passes through unchanged. */
  def registeredDomain(hostCol: Column): Column =
    graft.functions.RegisteredDomain.column(
      hostCol, pslExact, pslWildcardParents, pslExceptions, pslMaxLabels)

  /** Column-expression reference twin of [[registeredDomain]] — per-label-
    * count `isin` probes in a CASE tower; generated-code size grows with
    * the rule count (the 64 KB hazard above), so spec/parity use only. */
  def registeredDomainRef(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = concat_ws(".", slice(labels, -k, k))
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s.toSeq: _*)
    def isPublicSuffix(k: Int): Column = {
      val exactHit = inSet(lastK(k), pslExact.filter(_.count(_ == '.') == k - 1))
      val wildHit =
        if (k < 2) lit(false)
        else inSet(lastK(k - 1), pslWildcardParents.filter(_.count(_ == '.') == k - 2)) &&
          !inSet(lastK(k), pslExceptions)
      exactHit || wildHit
    }
    // default rule (suffix = bare TLD) as the base; wrap with longer
    // candidate suffixes so the LONGEST matching rule is checked first.
    // Exception rules (`!x.y.z`) are handled explicitly: per the PSL
    // algorithm the matching exception IS the registrable domain (its
    // public suffix is the exception minus the leftmost label) — falling
    // through to the default rule would be wrong whenever the exception's
    // parent is not a bare TLD (e.g. !city.kawasaki.jp under *.kawasaki.jp)
    val base = when(n >= 2, lastK(2)).otherwise(hostCol)
    val psl = (2 to pslMaxLabels).foldLeft(base) { (acc, k) =>
      when(n >= k && inSet(lastK(k), pslExceptions), lastK(k))
        .otherwise(when(n >= k + 1 && isPublicSuffix(k), lastK(k + 1)).otherwise(acc))
    }
    when(hostCol.rlike("^[0-9.]+$"), hostCol).otherwise(psl)
  }
}
