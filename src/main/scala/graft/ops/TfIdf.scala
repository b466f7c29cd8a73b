package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed TF-IDF over a tokenizable text column.
  *
  * Shape (the canonical two-shuffle formulation): explode terms →
  * hash-agg on (doc, term) for tf → hash-agg on term for df → shuffle
  * join tf⋈df on term. The document count rides in as a broadcast
  * 1-row cross join, so no global window / single-partition stage
  * anywhere. At 100 TB the vocabulary is far too large to broadcast —
  * the term join is a plain shuffle join on the term key, which AQE
  * skew-splits if a stopword-like term dominates.
  *
  * Determinism: tf/df/n_docs are exact longs. The idf uses `ln`, which
  * is NOT bit-identical across engines (measured: glibc vs JDK
  * StrictMath differ on ~7.5% of n/df inputs by 1 ulp) — so gated
  * comparisons must quantize the score (see the q101 gate, which
  * emits floor(score·10⁴+0.5): a 1-ulp input difference flips a 1e-4
  * quantum with probability ~1e-9 per row).
  */
object TfIdf {

  /** Per-(doc, term) statistics: tf, df, n_docs, and the classic
    * tf·ln(n/df) score. Terms are `\s+`-split, empties dropped. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread before the tokenize explode — the dominant map (the r16
    // ensureParallelism rule; no-op on multi-split sources)
    val terms = Dedup.ensureParallelism(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(col(idCol)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("n_docs"),
        col("tfidf"))
  }

  /** Top-k terms per document by tf-idf (desc), term asc as the
    * tie-break — one window pass over the tfidf frame, partitioned by
    * doc so parallelism is the corpus size. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
