package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis function library for the training-data pipeline layer
  * (BASELINE.json north star): token counting, quality signals,
  * language guessing, fingerprinting. All built from codegen'd
  * `org.apache.spark.sql.functions` so they stay inside whole-stage
  * codegen — no UDFs in the hot path.
  */
object TextFunctions {

  /** Whitespace tokens as an array column ("\S+" runs). */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** The engine-portable 60-bit hash family shared by minhash/simhash/
    * sampling: a 15-hex-digit window of md5 parsed as a long. md5 is
    * bytes-defined in every engine, so any of them reproduces the exact
    * value (DuckDB: `CAST(('0x' || substr(md5(x), start, 15)) AS
    * BIGINT)`); 60 bits keeps sign-free headroom in an i64.
    * `startDigit` (1-based) selects the window, giving independent
    * hashes from one md5 evaluation. */
  def md5Long(c: Column, startDigit: Int = 1): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5WindowLongExpr(org.apache.spark.sql.GraftColumnBridge.expression(c), startDigit))

  /** The original Column-chain derivation of [[md5Long]] — kept as the
    * independent reference implementation the equivalence spec pins the
    * [[Md5WindowLongExpr]] kernel against (and the exact form every
    * oracle reproduces in SQL). */
  private[graft] def md5LongChain(c: Column, startDigit: Int = 1): Column =
    conv(substring(md5(c), startDigit, 15), 16, 10).cast("long")

  /** Token count; counting-only plans never materialise the array. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** Count of non-overlapping regex matches. */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** A small default stopword list (English function words). */
  val Stopwords: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it", "on", "for")

  def stopwordCount(text: Column): Column =
    matchCount(lower(text), "\\b(" + Stopwords.mkString("|") + ")\\b")

  def punctCount(text: Column): Column = matchCount(text, "[.,;:!?]")

  /** Heuristic quality gate in pure integer arithmetic: docs with >=
    * minTokens tokens and at least one stopword per stopRatioDen tokens
    * pass — ratio thresholds cross-multiplied so no float compare. */
  def isQuality(text: Column, minTokens: Int = 10, stopRatioDen: Int = 50): Column =
    (tokenCount(text) >= minTokens) && (stopwordCount(text) * stopRatioDen >= tokenCount(text))

  /** Exact-duplicate fingerprint: md5 of the whitespace-normalised,
    * lower-cased text. md5 is bytes-defined, hence stable across
    * engines and cluster sizes — the exact-dedup key at any scale. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Per-language marker words for the language-guess heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "de", "y"))

  /** Language guess by marker-word counting — a stopword heuristic in
    * the spirit of public langid tools. Scores each language by marker
    * occurrences, argmax with first-listed-wins tiebreak, "und"
    * (undetermined) when nothing matches. Pure integer + case/when. */
  def langGuess(text: Column): Column = {
    val lowered = lower(text)
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, words) =>
      lang -> matchCount(lowered, "\\b(" + words.mkString("|") + ")\\b")
    }
    val idx = LangMarkers.map(_._1).zipWithIndex.toMap
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      val beatsAll = scores.filter(_._1 != lang).foldLeft(score > 0) { case (c, (other, s2)) =>
        c && (if (idx(lang) < idx(other)) score >= s2 else score > s2)
      }
      when(beatsAll, lit(lang)).otherwise(acc)
    }
  }

  /** BPE-ish pre-tokenizer pattern (the GPT-2-family shape): common
    * English contraction suffixes, then space-prefixed letter runs,
    * digit runs, punctuation/symbol runs, and whitespace runs. Restricted
    * to constructs shared by Java regex and RE2 (no lookaround, no
    * backreferences) so the exact same split reproduces in any engine. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"

  /** BPE-ish tokens (subword-style pre-tokens; a trained merge table
    * would apply downstream). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** BPE-ish token count; counting-only plans never build the array. */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Rolling polynomial hash over the token stream (document
    * fingerprinting à la Rabin-Karp): h = (h*31 + hash(token)) mod
    * 2^31-1, kept inside the safe Long range so the fold is exact under
    * ANSI mode (no wraparound). `aggregate` over the token array — a
    * sequential deterministic fold, no UDF. */
  def rollingHash(text: Column): Column = {
    val M = lit(2147483647L) // 2^31 - 1
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), M), M))
  }

  /** PII patterns for training-data scrubbing — restricted to
    * constructs shared by Java regex and RE2 (no lookaround) so the
    * same scrub reproduces in any engine. Deliberately high-recall
    * simple shapes (emails, international-ish phone runs, IPv4),
    * matching the public C4/Dolma-style cleaning recipes. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
  val Ipv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, phone numbers, and IPv4 addresses with typed
    * placeholder tokens. Chained codegen'd regexp_replace — order
    * matters (emails first, so their digit runs can't half-match the
    * phone pattern). */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** Count of PII matches by type (for scrub audits / doc filtering).
    * Counts on the SAME sequentially-scrubbed forms scrubPii replaces
    * on, so the tallies equal the placeholder counts it emits — a raw
    * independent count would double-book text matching two patterns
    * (e.g. an all-digit email local part re-matching as a phone). */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    (regexp_count(text, lit(EmailPattern)),
      regexp_count(noEmail, lit(Ipv4Pattern)),
      regexp_count(noIp, lit(PhonePattern)))
  }

  /** Word n-gram shingles from an ALREADY-MATERIALISED token array
    * column. The token array must be its own projected column, not an
    * inline `tokens(text)` expression: higher-order-function lambdas
    * evaluate interpreted with no subexpression sharing, so an inline
    * tokenizer would re-run the regex once per shingle index (measured
    * as the dominant cost of the dedup family). */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n), i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles of the text (convenience form — prefer
    * projecting `tokens` first and using shinglesFromTokens in hot
    * paths; see that method's note). */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)
}
