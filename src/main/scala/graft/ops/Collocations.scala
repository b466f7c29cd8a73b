package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram collocation mining by pointwise mutual information — a
  * standard corpus-analysis pass in a training-data pipeline (find the
  * multi-word expressions worth treating as units; also a cheap
  * phrase-level quality signal).
  *
  * PMI here is over adjacent-token bigrams:
  *   pmi(a,b) = ln( (c_ab / B) / ((c_a / N) · (c_b / N)) )
  * with c_ab the bigram count, B total bigrams, c_a/c_b unigram
  * counts, N total tokens — all exact longs from two hash
  * aggregations.
  *
  * Scale shape: tokenize once; bigrams are formed INSIDE the row (an
  * array zip of the token list with its own tail — no self-join on
  * position, which would shuffle the exploded corpus twice). Then two
  * hash-aggs (bigram counts, unigram counts) and two shuffle joins of
  * the bigram frame against the unigram frame on each side's token —
  * vocabulary-sized, AQE-skew-safe. The scalar totals ride in as one
  * broadcast row.
  *
  * Determinism: counts are exact; pmi evaluates a fixed IEEE dag whose
  * only non-correctly-rounded step is the final `ln` — gates must
  * quantize (see q107: floor(pmi·10⁴+0.5); a 1-ulp input flips a
  * quantum with probability ~1e-9/row, same discipline as q101's
  * tf-idf).
  */
object Collocations {

  /** Per-bigram statistics over whitespace-tokenized text: counts and
    * the PMI score. `minCount` prunes rare bigrams BEFORE the unigram
    * joins (cuts the join input by ~10× on natural text). */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 5L): DataFrame = {
    // spread before the tokenize map (the r16 ensureParallelism rule —
    // single-file corpora otherwise plan it as 1-2 tasks; no-op on
    // multi-split sources). toks feeds both the unigram and bigram
    // explodes, so the one exchange parallelizes both.
    val toks = Dedup.ensureParallelism(docs.select(col(textCol))).select(
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("ts"))
    val uni = toks.select(explode(col("ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    // zip ts[0..n-2] with ts[1..n-1]: bigrams without leaving the row
    val big = toks
      .select(explode(zip_with(
        slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
        slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col("bg.t1"), col("bg.t2"))
    val counts = big.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // scalar totals come straight off the token lists — no explode, one row
    val totals = toks.agg(
      sum(size(col("ts")).cast("long")).as("n_tokens"),
      sum(greatest(size(col("ts")) - 1, lit(0)).cast("long")).as("n_bigrams"))
    counts
      .join(uni.withColumnRenamed("t", "t1").withColumnRenamed("c", "c_a"), "t1")
      .join(uni.withColumnRenamed("t", "t2").withColumnRenamed("c", "c_b"), "t2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi",
        log((col("c_ab").cast("double") / col("n_bigrams").cast("double")) /
          ((col("c_a").cast("double") / col("n_tokens").cast("double")) *
           (col("c_b").cast("double") / col("n_tokens").cast("double")))))
      .select(col("t1"), col("t2"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_tokens"), col("n_bigrams"), col("pmi"))
  }
}
