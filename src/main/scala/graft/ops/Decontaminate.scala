package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set, so eval questions don't leak
  * into the training corpus (the standard n-gram-overlap check used by
  * public LLM data pipelines, e.g. the 13-gram test in GPT-3's appendix
  * and Dolma's decontamination stage).
  *
  * Scale shape: one pass over the corpus. The benchmark side — eval
  * suites are megabytes even when the corpus is 100 TB — collapses to a
  * distinct n-gram hash set that is BROADCAST, so the overlap test is a
  * map-side broadcast join with no corpus shuffle. The per-doc shingle
  * count rides along each exploded gram row as a map-side scalar
  * (constant per doc), so no second pass / doc-keyed shuffle of the full
  * gram set is ever needed for the denominator; the only exchange is the
  * per-doc count aggregate over MATCHING rows — a vanishingly small
  * fraction. N-grams compare as 64-bit xxhash64 keys like [[Dedup]]'s
  * shingle index: long equality, collision odds ~|grams|²/2⁻⁶⁴,
  * immaterial for counting.
  */
object Decontaminate {

  /** Per-document contamination report: (doc_id, n_hits, n_shingles)
    * for every corpus doc sharing at least one distinct word n-gram with
    * `bench`, where n_hits counts the shared distinct n-grams and
    * n_shingles the doc's total distinct n-grams (so callers can
    * threshold on absolute hits or on the contaminated fraction). */
  def contamination(corpus: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame = {
    // tokens and the distinct-gram array projected as their own columns
    // first — HOF lambdas evaluate interpreted with no subexpression
    // sharing, so inline nesting would re-run the regex per shingle
    // index (see TextFunctions.shinglesFromTokens)
    val corpusGrams = Dedup.ensureParallelism(corpus)
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("__g"))
      .select(col("doc_id"), size(col("__g")).cast("long").as("n_shingles"),
        explode(col("__g")).as("__s"))
      .select(col("doc_id"), col("n_shingles"), xxhash64(col("__s")).as("gram"))
    val benchGrams = bench
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), n))).as("__s"))
      .select(xxhash64(col("__s")).as("gram")).distinct()
    corpusGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("n_shingles")).as("n_shingles"))
  }
}
