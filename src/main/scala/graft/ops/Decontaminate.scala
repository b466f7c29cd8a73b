package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bloom-filter decontamination: the same per-doc overlap report as
    * [[contamination]], but membership is tested against an
    * `mBits`-slot / `kHashes`-probe Bloom filter built over the bench
    * grams instead of the grams themselves — the standard trade at
    * extreme scale (a filter over a billion bench grams is `m` bits;
    * the gram set itself is tens of GB) and the standard privacy trade
    * (bench text never appears in the shipped artifact, only bit
    * positions). Output is (doc_id, n_flagged, n_shingles) where
    * n_flagged counts the doc's distinct grams the filter REPORTS as
    * present — a superset of the true hits that includes the filter's
    * false positives, by design.
    *
    * Every position is md5-derived ([[TextFunctions.md5Long]] of
    * `gram:j` mod mBits), so filter contents — and therefore the exact
    * false-positive set — are bit-identical across engines, runs and
    * partitionings; q91 pins that parity against a DuckDB re-derivation
    * at an `m` chosen to make false positives actually occur at gate
    * scale. (Spark's built-in `DataFrameStatFunctions.bloomFilter`,
    * spec'd in ApproxAggSpec, uses engine-private hashing and can't be
    * oracle-gated; this one can.)
    *
    * Scale shape: one pass over the corpus, exactly like
    * [[contamination]] — the filter is realised RELATIONALLY as the
    * distinct set-bit positions (≤ min(benchGrams·k, m) longs, i.e. at
    * most m/8 bytes ignoring dedup) and broadcast, so the probe is a
    * map-side broadcast hash join on an 8-byte key: the broadcast hash
    * table IS the bit set, just keyed sparsely. A gram is flagged when
    * all `kHashes` of its positions match (count == k after the join —
    * position self-collisions within a gram behave identically on both
    * sides because the j-rows join at-most-once against the distinct
    * position set). Only matching rows — true hits plus the FP margin —
    * reach the two tiny aggregations; the corpus never shuffles its
    * gram set. */
  def bloomContamination(corpus: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         mBits: Int = 1 << 22, kHashes: Int = 3): DataFrame = {
    require(mBits >= 2, s"mBits must be >= 2, got $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    val js = array((0 until kHashes).map(lit): _*)
    def pos(gram: Column, j: Column): Column =
      TextFunctions.md5Long(concat(gram, lit(":"), j.cast("string"))) % mBits
    val benchPos = bench
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), n))).as("__g"))
      .distinct()
      .select(col("__g"), explode(js).as("__j"))
      .select(pos(col("__g"), col("__j")).as("__p"))
      .distinct()
    Dedup.ensureParallelism(corpus)
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("__gs"))
      .select(col("doc_id"), size(col("__gs")).cast("long").as("n_shingles"),
        explode(col("__gs")).as("__g"))
      .select(col("doc_id"), col("n_shingles"), col("__g"), explode(js).as("__j"))
      .withColumn("__p", pos(col("__g"), col("__j")))
      .join(broadcast(benchPos), Seq("__p"))
      .groupBy(col("doc_id"), col("__g"))
      .agg(max(col("n_shingles")).as("n_shingles"), count(lit(1)).as("__set"))
      .filter(col("__set") === kHashes)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_flagged"), max(col("n_shingles")).as("n_shingles"))
  }
}
