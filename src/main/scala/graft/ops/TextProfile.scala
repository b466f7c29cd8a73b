package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-profiling operators for the training-data pipeline layer:
  * repetition signals in the style of the Gopher quality filters
  * (Rae et al. 2021, "Scaling Language Models", Table A1 — fraction of
  * duplicated n-grams / most-frequent-n-gram share) re-expressed as
  * shuffle-conscious DataFrame plans.
  *
  * All outputs are integer counts so the DuckDB oracle compares exactly;
  * consumers derive the fractional signals (`top_bigram_n / n_bigrams`
  * etc.) downstream without any float determinism concerns.
  */
object TextProfile {

  /** The Gopher document-quality rule set (Rae et al. 2021, Table A1),
    * exact-integer form: every ratio threshold is cross-multiplied so
    * the decision needs no division and no floats, making the full
    * rule vector hash-gateable against a SQL engine.
    *
    *   1. word count within [minWords, maxWords]
    *   2. mean word length within [3, 10] chars (3·W ≤ C ≤ 10·W over
    *      non-whitespace chars C)
    *   3. symbol-to-word ratio ('#' and '...') ≤ 0.1  (10·S ≤ W)
    *   4. ≤ 90% of lines start with a bullet  (10·B ≤ 9·L)
    *   5. ≤ 30% of lines end with an ellipsis (10·E ≤ 3·L)
    *   6. ≥ 80% of words contain an alphabetic char (5·A ≥ 4·W)
    *   7. ≥ 2 of Gopher's 8 indicator stopwords present
    *
    * One map-only projection per document — regexp counts inside the
    * scan stage, no shuffle at all until a caller aggregates; the
    * canonical pre-dedup quality gate of the Gopher/MassiveText
    * pipeline, run corpus-wide at ingest. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got $minWords/$maxWords")
    // CR-strip first: Java regex and RE2 disagree on what (?m)'s ^/$
    // anchor to for non-\n terminators (Java honors \r\n and  …,
    // RE2 anchors on \n only), so CRLF text would count line rules
    // differently per engine. \r is \s, so no other census changes.
    val t = regexp_replace(col(textCol), "\r", "")
    // counts in LONG: the cross-multiplied thresholds (×10, ×9) must
    // not wrap for pathological near-2GB documents
    val nWords = regexp_count(t, lit("\\S+")).cast("long")
    val nWchars = length(regexp_replace(t, "\\s", "")).cast("long")
    val nSym = (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))).cast("long")
    val nLines = size(split(t, "\n")).cast("long")
    val nBullet = regexp_count(t, lit("(?m)^[ \\t]*[-*•]")).cast("long")
    val nEllEnd = regexp_count(t, lit("(?m)\\.\\.\\.$")).cast("long")
    val nAlphaW = regexp_count(t, lit("\\S*[A-Za-z]\\S*")).cast("long")
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => when(lower(t).rlike(s"\\b$w\\b"), 1).otherwise(0))
      .reduce(_ + _)
    docs.select(col(idCol),
      nWords.as("n_words"),
      (nWords >= minWords && nWords <= maxWords).as("r_word_count"),
      (nWchars >= nWords * 3 && nWchars <= nWords * 10).as("r_mean_word_len"),
      (nSym * 10 <= nWords).as("r_symbol_ratio"),
      (nBullet * 10 <= nLines * 9).as("r_bullet_lines"),
      (nEllEnd * 10 <= nLines * 3).as("r_ellipsis_lines"),
      (nAlphaW * 5 >= nWords * 4).as("r_alpha_words"),
      (stopHits >= 2).as("r_stopwords"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_lines") && col("r_ellipsis_lines") &&
          col("r_alpha_words") && col("r_stopwords"))
  }

  /** Per-document repetition signals:
    *   - n_tokens / n_distinct_tokens   (duplicate-token share)
    *   - n_bigrams / top_bigram_n       (most-frequent-2-gram share)
    *
    * Plan shape: tokenize once, then two branches — a per-doc scalar
    * projection (sizes + array_distinct, linear per doc) and an
    * explode → (doc, bigram) count → per-doc max/sum aggregate. Both
    * aggregates partial-combine map-side; the only wide exchanges are
    * hash shuffles on (doc, bigram) and doc — no cross product, no
    * per-doc quadratic work, so the shape holds at 100 TB. Documents
    * with < 2 tokens report 0 bigrams (left join + coalesce).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Pin the tokenised form behind an id-partitioned exchange: the
    // scan+regex tokenise stage runs ONCE and its shuffle output feeds
    // both branches (ReusedExchange) — without this each branch re-reads
    // and re-tokenises the corpus. The explicit isNotNull matters: the
    // bigram branch (inner side of the final left join) gets an inferred
    // isnotnull(id) pushed below the exchange, and without the same
    // filter on the scalar branch the two exchange subtrees canonicalise
    // differently and reuse is lost. Null-id docs carry no usable key
    // and are dropped (reference ids are non-null).
    val tokArr = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("ts"))
      .repartition(col("id"))
    val tokenStats = tokArr.select(
      col("id"),
      size(col("ts")).as("n_tokens"),
      size(array_distinct(col("ts"))).as("n_distinct_tokens"))
    val bigramStats = tokArr
      .select(col("id"), explode(TextFunctions.shinglesFromTokens(col("ts"), 2)).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    tokenStats.join(bigramStats, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("n_distinct_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }

  /** Per-source curation stats — the signal web-corpus pipelines use to
    * filter or cap whole sources (RefinedWeb / C4 style: a source whose
    * documents are mostly mutual duplicates is boilerplate-heavy and
    * gets down-weighted or dropped before any per-document work):
    *
    *   - n_docs, total_chars        (size/mass of the source)
    *   - mean_tokens                (sum tokens / docs, exact-int division
    *                                 surfaced as double)
    *   - n_unique                   (distinct md5 text fingerprints)
    *   - dup_rate                   (1 - n_unique / n_docs)
    *
    * Plan shape: one narrow projection (length / token count / md5 per
    * row, all codegen'd) then a single hash aggregate keyed by source;
    * the distinct-count is Spark's standard two-phase partial distinct.
    * Sources number in the thousands at most, so the aggregate output
    * is driver-tiny at any corpus size. Floats are single divisions of
    * exact integers — bit-deterministic across engines. */
  def sourceStats(docs: DataFrame, textCol: String, sourceCol: String): DataFrame =
    docs.select(
        col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("__chars"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__toks"),
        md5(col(textCol)).as("__fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("total_chars"),
        (sum(col("__toks")).cast("double") / count(lit(1))).as("mean_tokens"),
        countDistinct(col("__fp")).as("n_unique"))
      .withColumn("dup_rate",
        lit(1.0) - col("n_unique").cast("double") / col("n_docs"))

  /** Per-document Flesch reading-ease (Flesch 1948) in exact
    * milli-units: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), scaled ×1000 with both ratios as integer
    * floor divisions — no float anywhere, so the score is
    * engine-identical. Syllables are approximated by vowel-group runs
    * ([aeiouy]+, the standard cheap estimator) and sentences by
    * terminal-punctuation runs, floored at 1 so fragments still score.
    * Map-only codegen'd regex counting; empty documents drop. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_words"),
        greatest(regexp_count(col(textCol), lit("[.!?]+")).cast("long"), lit(1L))
          .as("n_sentences"),
        regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch_e3", expr(
        "206835 - (1015 * n_words) div n_sentences - (84600 * n_syllables) div n_words"))

  /** Per-group n-gram lexical diversity (the corpus-level type-token
    * ratio used to flag mode-collapsed/synthetic slices — a shrinking
    * distinct-share under a growing token count is the collapse
    * signature). Output per group: total n-gram instances, distinct
    * n-grams, and the 10^6-quantized distinct share (integer div —
    * exact in every engine).
    *
    * Plan shape: tokenize + n-gram assembly are one map-only array
    * transform (no positional join — the q124 bigram machinery
    * generalized to n); then (group, gram) hash agg → per-group agg.
    * Both aggregates combine map-side; gram text crosses the wire only
    * keyed for the first agg, and group cardinality is tiny so the
    * second is driver-trivial at any corpus size. */
  def ngramDiversity(docs: DataFrame, groupCol: String, textCol: String,
                     n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    // spread before the tokenize+shingle explode (the r16
    // ensureParallelism rule — single-file corpora plan this map as
    // 1-2 tasks; no-op on multi-split sources)
    val grams = Dedup.ensureParallelism(
        docs.select(col(groupCol).as("grp"), col(textCol).as("text")))
      .withColumn("toks",
        expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)"))
      .select(col("grp"), explode(expr(
        s"""CASE WHEN size(toks) >= $n
            THEN transform(sequence(0, size(toks) - $n),
                           i -> concat_ws(' ', slice(toks, i + 1, $n)))
            ELSE array() END""")).as("gram"))
    grams.groupBy(col("grp"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("ttr_e6", expr("(1000000 * distinct_ngrams) div total_ngrams"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Feature hashing (the "hashing trick", Weinberger et al. 2009):
    * each token adds ±1 to dimension md5₆₀(token) mod d, sign from an
    * independent md5 window (the [[graft.functions.TextFunctions.md5Long]]
    * startDigit family) — the unbiased signed construction, so inner
    * products estimate token-count inner products without a vocabulary
    * table, OOV problem, or fit step. Engine-portable and exact: every
    * feature is an integer sum of ±1s. One token explode + one
    * map-side-combined hash aggregate; output rows only for NONZERO
    * dimensions (a sparse vector — at 100 TB never materialize d
    * columns). Output: (id, dim, feat). */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     d: Int): DataFrame = {
    require(d >= 2, s"need d >= 2 dimensions, got $d")
    // spread before the tokenize+hash explode (the r16 rule, as above)
    Dedup.ensureParallelism(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .select(col("id"),
        pmod(TextFunctions.md5Long(col("__t")), lit(d.toLong)).cast("int").as("dim"),
        when(pmod(TextFunctions.md5Long(col("__t"), startDigit = 17), lit(2L)) === 0L, 1L)
          .otherwise(-1L).as("__s"))
      .groupBy(col("id"), col("dim"))
      .agg(sum(col("__s")).as("feat"))
      .filter(col("feat") =!= 0L)
  }

  /** Per-document out-of-vocabulary profile against an explicit
    * vocabulary relation — the tokenizer-coverage audit run before a
    * vocab ships (a rising OOV rate on a new corpus slice is the
    * signal a tokenizer no longer fits its data). Pairs naturally with
    * [[HeavyHitters.heavyHitters]] (vocabulary = the frequency floor)
    * or the q128 BPE merge table. One token explode, one broadcast-
    * friendly join against the (small) vocab, one per-doc aggregate;
    * oov_rate_e6 is the exact floored rational. Docs with no tokens
    * emit nothing (no denominator). Output:
    * (id, n_tokens, n_oov, oov_rate_e6). */
  def oovProfile(docs: DataFrame, idCol: String, textCol: String,
                 vocab: DataFrame, vocabCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val v = vocab.select(col(vocabCol).as("__t")).distinct()
      .withColumn("__in", lit(1))
    toks.join(broadcast(v), Seq("__t"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      // both terms non-negative: DIV is already the floor
      .withColumn("oov_rate_e6", expr("(1000000 * n_oov) DIV n_tokens"))
  }
}
