package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 (Okapi, Lucene idf variant) document scoring for a fixed query
  * term set — the retrieval-grade relevance scorer the TF-IDF family
  * (ops.TfIdf) doesn't cover: saturating term frequency (k1) and
  * document-length normalization (b).
  *
  *   score(d, q) = Σ_{t ∈ q} ln((N − df + ½)/(df + ½) + 1)
  *                 · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
  *
  * Shape: one explode over the corpus feeds BOTH per-doc lengths and
  * per-(doc, query-term) tf (the term filter is a pushed literal IN —
  * only query-term rows reach the tf agg); df aggregates the tf frame
  * (query-vocabulary-sized); N/avglen ride in as a broadcast 1-row
  * cross join. The only corpus-sized shuffles are the two hash aggs —
  * same envelope as TfIdf, no window, no join keyed by doc text.
  *
  * Determinism (q101/q88 discipline): ln is the one non-portable op
  * (libm implementations differ at the ulp level), and a DOUBLE sum
  * over per-term contributions would additionally be partition-order
  * dependent. So each per-term contribution is quantized to exact
  * integer 1e-4 units FIRST (floor(c·10⁴ + ½)) and the per-doc score
  * is an exact LONG sum of those — associative, engine-identical.
  * Callers wanting floats divide by 1e4.
  *
  * The quantum is 1e-4, NOT 1e-6: in round 8 the 1e-6 variant diffed
  * to zero rows against DuckDB 1.0.0 locally at sf0.01 AND sf0.1 yet
  * was red on the driver's gate — a different libm can drift a few
  * ulps, and at 1e-6 quanta that is within flipping range of a floor
  * boundary. 1e-4 is the proven-portable rule (ops/TfIdf.scala:22,
  * q101 green since r6); the output also carries exact-long evidence
  * columns (tf_sum, len) so most of the gated hash is
  * transcendental-free.
  *
  * Docs containing no query term score 0 and are omitted (BM25 is a
  * sparse score); docs with empty text don't count toward N or avglen
  * (they have no length evidence), mirrored in the oracle.
  */
object Bm25 {

  /** (id, n_terms_matched, tf_sum, len, bm25_e4) for docs matching ≥1
    * query term. Terms are `\s+`-split, empties dropped — the TfIdf
    * tokenization. `tf_sum` = Σ tf over matched terms and `len` are
    * exact longs; `bm25_e4` is the score in 1e-4 units. */
  def bm25E4(docs: DataFrame, idCol: String, textCol: String,
             queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val lens = terms.groupBy(col(idCol)).agg(count(lit(1)).as("len"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("total_len"))
    val tf = terms.filter(col("term").isin(queryTerms.map(lit): _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // expression trees mirrored verbatim in the q112 oracle SQL — edit
    // both together or the quantized gate diverges
    val avglen = col("total_len").cast("double") / col("n_docs").cast("double")
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfc = (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + (lit(b) * col("len").cast("double")) / col("avglen")))

    tf.join(dfc, "term")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("avglen", avglen)
      .withColumn("__c_e4",
        floor(idf * tfc * lit(10000.0) + lit(0.5)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("tf")).as("tf_sum"),
        max(col("len")).as("len"),
        sum(col("__c_e4")).as("bm25_e4"))
  }
}
