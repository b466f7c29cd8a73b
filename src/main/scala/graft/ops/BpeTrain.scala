package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary learning (Sennrich et al. 2016): the
  * iterative most-frequent-pair merge over a word-frequency table —
  * the TRAINING side of the tokenizer family (q45 applies a BPE-ish
  * pre-tokenizer; this learns the merge list itself).
  *
  * Representation: a word's symbol sequence is one string with every
  * symbol wrapped in sentinel brackets (U+0001 s U+0002, absent from
  * the corpus by audit). Merging pair (a,b) is then a LITERAL string
  * replace of "⟨a⟩⟨b⟩" with "⟨ab⟩" — and because adjacent wrapped
  * symbols share no characters, left-to-right non-overlapping replace
  * (both Spark's UTF8String.replace and DuckDB's replace) implements
  * exactly BPE's greedy in-word merge scan ("aaa" + (a,a) → "aa","a").
  *
  * Scale shape: everything iterates over the DISTINCT-WORD table
  * (Heaps-law sized — orders of magnitude under the corpus; the one
  * corpus-sized pass is the initial word count, a single hash agg).
  * Each merge step is one (a,b)-keyed hash agg over the word table +
  * a driver-side argmax of ONE row (the learned merge — model-sized,
  * the kmeans-centroid precedent) + a map-only replace, with a
  * lineage cut per step so plan depth stays constant. 10 merges = 10
  * small vocab-table jobs, never a corpus re-scan.
  */
object BpeTrain {

  private val L = "\u0001"
  private val R = "\u0002"

  /** One learned merge: the pair, its weighted count, rank of step. */
  final case class Merge(step: Int, lhs: String, rhs: String, cnt: Long)

  /** Corpus word-frequency table: lower-cased `\s+` tokens (the text
    * family protocol) with exact counts — the only corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(
        s"filter(split(lower($textCol), '\\\\s+'), t -> length(t) > 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Encode a word into its bracketed character-symbol string. */
  private def encode(word: Column): Column =
    expr(s"concat_ws('', transform(split(word, ''), c -> concat('$L', c, '$R')))")

  /** Weighted adjacent-pair counts over the current symbol table. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("syms",
        expr(s"regexp_extract_all(seq, '$L([^$R]+)$R', 1)"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(0, size(syms) - 2),
                     i -> struct(syms[i] AS a, syms[i + 1] AS b))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Learn `nMerges` merges. Ties break by (count desc, lhs asc,
    * rhs asc) in binary string order — deterministic across engines
    * for BMP text. Stops early if no pair remains.
    *
    * Pair counts are DELTA-MAINTAINED (the IncrementalAgg discipline
    * applied to BPE): the full pair aggregate runs ONCE at init; each
    * merge step then recounts only the AFFECTED words — those whose
    * symbol string contains the merged pair's literal (a map-only
    * filter; a merge can only change adjacencies inside words it
    * rewrites) — and folds the after−before delta into the maintained
    * count table. The per-step argmax reads the maintained table
    * (pair-vocab-sized) instead of re-aggregating the whole word
    * table, so per-step cost tracks the affected-word mass: at a real
    * 32K-merge vocab, late merges touch tiny slices and cost
    * accordingly, instead of 32K full aggregates over the word table
    * (PrepScaleProbe records the 64/256-merge series).
    *
    * Word-table replaces stay map-only pure lineage with a cut every
    * `checkpointInterval` steps; the maintained counts (small)
    * materialise every step — that is the delta fold. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  checkpointInterval: Int = 4,
                  materialize: DataFrame => DataFrame = _.localCheckpoint()): Seq[Merge] =
    learnLoop(docs, textCol, nMerges, checkpointInterval, materialize,
      collectStats = false)._1

  /** One learned step's probe record: the merge, how many distinct
    * words its delta recount touched, and the step's wall time. */
  final case class StepStat(step: Int, affectedWords: Long, sec: Double)

  /** [[learnMerges]] with per-step instrumentation (affected-word mass
    * + wall time) — the PrepScaleProbe/BpeMergeProbe surface proving
    * per-step cost tracks the affected slice, not the word table. */
  def learnMergesInstrumented(docs: DataFrame, textCol: String, nMerges: Int,
                              checkpointInterval: Int = 4,
                              materialize: DataFrame => DataFrame = _.localCheckpoint())
      : (Seq[Merge], Seq[StepStat]) =
    learnLoop(docs, textCol, nMerges, checkpointInterval, materialize,
      collectStats = true)

  private def learnLoop(docs: DataFrame, textCol: String, nMerges: Int,
                        checkpointInterval: Int,
                        materialize: DataFrame => DataFrame,
                        collectStats: Boolean): (Seq[Merge], Seq[StepStat]) = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    require(checkpointInterval >= 1, s"interval must be positive, got $checkpointInterval")
    var words = materialize(
      wordCounts(docs, textCol).select(encode(col("word")).as("seq"), col("freq")))
    // the ONE full pair aggregate; everything after is deltas
    var counts = materialize(pairCounts(words))
    val out = Seq.newBuilder[Merge]
    val stats = Seq.newBuilder[StepStat]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val t0 = System.nanoTime()
      val top = counts
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(step, a, b, c)
        val pat = s"$L$a$R$L$b$R"
        val rep = s"$L$a$b$R"
        // affected = words that actually contain the merged pair;
        // materialised once so the before/after recounts don't re-run
        // the word-table filter twice
        val affected = materialize(words.filter(col("seq").contains(pat)))
        val after = affected.withColumn("seq", replace(col("seq"), lit(pat), lit(rep)))
        counts = materialize(
          counts
            .unionByName(pairCounts(after))
            .unionByName(pairCounts(affected)
              .select(col("a"), col("b"), (-col("cnt")).as("cnt")))
            .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("cnt"))
            .filter(col("cnt") > 0))
        words = words.withColumn("seq", replace(col("seq"), lit(pat), lit(rep)))
        if (step % checkpointInterval == 0) words = materialize(words)
        if (collectStats)
          stats += StepStat(step, affected.count(), (System.nanoTime() - t0) / 1e9)
        step += 1
      }
    }
    (out.result(), stats.result())
  }

  /** The learned merge list as a DataFrame (step, lhs, rhs, cnt) —
    * the gate/catalog surface. */
  def merges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, nMerges).toDF("step", "lhs", "rhs", "cnt")
  }

  /** Apply a learned merge list and report per-document BPE token
    * counts and fertility (BPE tokens per whitespace word, the
    * tokenizer-efficiency signal that decides vocab size per language):
    * (id, n_words, n_bpe_tokens, fertility_e6).
    *
    * The merge chain is MAP-ONLY over word instances — each word is
    * encoded and run through the replace chain inline in the scan
    * stage (codegen'd string ops; nothing shuffles but the per-doc
    * aggregate). The symbol count is the sentinel count, a length
    * difference — the array is never materialised. */
  def encodedTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         learned: Seq[Merge]): DataFrame = {
    val words = docs.select(col(idCol), explode(expr(
      s"filter(split(lower($textCol), '\\\\s+'), t -> length(t) > 0)")).as("word"))
    val seqN = learned.foldLeft(encode(col("word"))) { (s, m) =>
      replace(s, lit(s"$L${m.lhs}$R$L${m.rhs}$R"), lit(s"$L${m.lhs}${m.rhs}$R"))
    }
    words
      .select(col(idCol),
        (length(seqN) - length(replace(seqN, lit(L), lit("")))).cast("long").as("n_sym"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
      .withColumn("fertility_e6", expr("(1000000 * n_bpe_tokens) div n_words"))
  }
}
