package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline (builder brief):
  * token counting, substring frequency, quality scoring, language ID,
  * document fingerprinting. All pure column expressions (whole-stage
  * codegen; no UDF), with integer/exact-rational outputs so the DuckDB
  * oracle hashes identically.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer regex (BPE-ish), simplified to the subset
    * both java.util.regex and RE2 (DuckDB) support — no lookahead, ASCII
    * classes: contractions, space-prefixed letter runs, digit runs,
    * punctuation runs, residual spaces. Cross-engine agreement is
    * oracle-gated (q39). */
  val BpeishPattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Occurrences of `sub` by the length-difference trick (same trick is
    * SQL-portable to the oracle). Counts overlapping-free left-to-right
    * matches, substring-level (may match inside words — deterministic). */
  def substrCount(text: Column, sub: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(sub), ""))) /
      sub.length).cast("long")

  /** Quality metrics: exact ints + single-division rationals. */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val nTok = tokenCount(text).cast("long")
    val nChars = length(text).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      // mean token length: (chars - separators) / tokens, one exact division
      "mean_tok_len" -> ((nChars - (nTok - 1)).cast("double") / nTok.cast("double")),
      "stopword_cnt" -> substrCount(text, "the"),
      "digit_cnt" -> (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long"))
  }

  /** PII scrubbing (the CCNet/Dolma pre-release pass): replace emails,
    * dotted-quad IPs, and international-format phone numbers with fixed
    * placeholder tokens. Patterns are lookahead-free ASCII regexes — the
    * dialect slice where java.util.regex and RE2 (the DuckDB oracle)
    * agree exactly — applied in a fixed order (email first, so its
    * digits are gone before the phone pass). Pure regexp_replace chain:
    * codegen'd, linear, no UDF. */
  val PiiEmailRe = "[A-Za-z0-9._-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+"
  val PiiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PiiPhoneRe = "\\+[0-9]{1,3}([ -][0-9]{2,4}){1,3}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "<EMAIL>"),
        PiiIpRe, "<IP>"),
      PiiPhoneRe, "<PHONE>")

  /** How many of each PII class the text carries (pre-redaction). */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    def cnt(re: String) =
      size(regexp_extract_all(text, lit(s"($re)"), lit(1))).cast("long")
    Seq("n_email" -> cnt(PiiEmailRe), "n_ip" -> cnt(PiiIpRe),
      "n_phone" -> cnt(PiiPhoneRe))
  }

  /** Toy n-gram-marker language ID: count marker tokens per language,
    * argmax with a fixed precedence order (deterministic; SQL-portable). */
  def langId(text: Column): Column = {
    val en = substrCount(text, "the")
    val q = substrCount(text, "query")
    val d = substrCount(text, "data")
    when(en >= q && en >= d, "en").when(q >= d, "qlang").otherwise("dlang")
  }

  /** Polynomial rolling fingerprint over token vocab-ids (needs a `vid`
    * column from [[Dedup.vocab]]); order-sensitive left fold with multiplier
    * 31 in the ring mod 2^56 — staying well under Long range because Spark 4
    * runs ANSI mode (overflow throws, no silent wrap). */
  val FingerprintMod = 1L << 56
  def fingerprint(vids: Column): Column =
    aggregate(vids, lit(1125899906842597L % FingerprintMod),
      (acc, v) => pmod(acc * 31L + v, lit(FingerprintMod)))

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, word-unit
    * simplification — the corpus has no line structure):
    *  - `dup_token_frac`: 1 − distinct/total tokens,
    *  - `top_bigram_frac`: characters of the most frequent word bigram
    *    (count × bigram length) / document length; ties break on the
    *    lexicographically largest bigram (max over (count, gram) structs —
    *    identical total order in both engines),
    *  - `dup_trigram_frac`: characters of trigrams occurring more than
    *    once (Σ count × length) / document length, overlap-agnostic.
    * Scale shape: one explode + hash-agg per n-gram size, shuffles keyed
    * by (doc, gram) then doc — linear in corpus tokens, no self-joins. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("nc", length(col("text")))
    def gramRows(n: Int) = base.select(col("id"), col("nc"),
      explode(when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => array_join(slice(col("toks"), i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val dupTok = base.select(col("id"),
      ((col("n_tokens") - size(array_distinct(col("toks")))).cast("double") /
        col("n_tokens").cast("double")).as("dup_token_frac"))
    val top = gramRows(2).groupBy("id", "nc", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("id", "nc").agg(max(struct(col("cnt"), col("gram"))).as("t"))
      .select(col("id"), ((col("t.cnt") * length(col("t.gram"))).cast("double") /
        col("nc").cast("double")).as("top_bigram_frac"))
    val tri = gramRows(3).groupBy("id", "nc", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("id", "nc")
      .agg(sum(when(col("cnt") > 1, col("cnt") * length(col("gram")))
        .otherwise(0L)).as("dupChars"))
      .select(col("id"),
        (col("dupChars").cast("double") / col("nc").cast("double")).as("dup_trigram_frac"))
    base.select("id", "n_tokens").join(dupTok, "id")
      .join(top, Seq("id"), "left").join(tri, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("dup_token_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
  }

  /** CCNet-style corpus-frequency rarity signal, kept integer-exact: per
    * doc the bigram count, the sum of each bigram's corpus occurrence
    * count (high = boilerplate-heavy), and the rarest bigram's corpus
    * count (1 = contains a corpus-unique bigram — the gibberish/novelty
    * flag). Shapes: linear explode → corpus hash-agg → equi-join back →
    * per-doc hash-agg; the bigram table is the only shuffled relation and
    * is corpus-bounded, never quadratic. */
  def bigramRarity(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    val bg = base.select(col("id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => array_join(slice(col("toks"), i + 1, lit(2)), " ")))
        .otherwise(array().cast("array<string>"))).as("bigram"))
    val cf = bg.groupBy("bigram").agg(count(lit(1)).as("cf"))
    bg.join(cf, "bigram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("cf").as("sum_cf"),
        min("cf").as("min_cf"))
  }
}
