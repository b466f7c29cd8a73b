package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the engine's Column-composed function
  * library — the reference's analysts live in SQL (the dbt-delegated
  * layer, SURVEY §0), so every text/vector/sampling primitive that a
  * DataFrame caller gets from [[TextFunctions]] / [[VectorFunctions]] /
  * [[graft.ops.Sampling]] is also callable as a SQL function:
  *
  * {{{
  *   SELECT doc_id FROM documents
  *   WHERE graft_is_quality(text) AND graft_lang_guess(text) = 'en'
  *     AND graft_split_label(doc_id) = 'train'
  * }}}
  *
  * The functions are pure Catalyst compositions (no UDFs): each builder
  * reuses the exact Column expression the Scala API builds — identical
  * semantics, identical codegen — via the [[GraftColumnBridge]]
  * Column↔Expression conversion. Load cluster-wide with
  * `spark.sql.extensions=graft.GraftExtensions`, or per session with
  * [[SqlSurface.register]].
  *
  * Functions taking a scalar parameter (bucket count, shingle width)
  * require a foldable (literal) argument, mirroring how the Scala API
  * takes them as Ints. */
object SqlSurface {

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: java.lang.Number => n.intValue
      case other => throw new IllegalArgumentException(s"$what must be numeric, got $other")
    }
  }

  private def c(e: Expression): Column = GraftColumnBridge.column(e)

  /** name -> (arity description, builder). Single registry consumed by
    * both the session extension and programmatic registration. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokens" -> ((es: Seq[Expression]) => TextFunctions.tokens(c(es.head))),
    "graft_token_count" -> ((es: Seq[Expression]) => TextFunctions.tokenCount(c(es.head))),
    "graft_bpe_token_count" -> ((es: Seq[Expression]) => TextFunctions.bpeTokenCount(c(es.head))),
    "graft_stopword_count" -> ((es: Seq[Expression]) => TextFunctions.stopwordCount(c(es.head))),
    "graft_punct_count" -> ((es: Seq[Expression]) => TextFunctions.punctCount(c(es.head))),
    "graft_lang_guess" -> ((es: Seq[Expression]) => TextFunctions.langGuess(c(es.head))),
    "graft_is_quality" -> ((es: Seq[Expression]) => es match {
      case Seq(t) => TextFunctions.isQuality(c(t))
      case Seq(t, m, d) => TextFunctions.isQuality(c(t),
        litInt(m, "minTokens"), litInt(d, "stopRatioDen"))
      case _ => throw new IllegalArgumentException("graft_is_quality(text[, minTokens, stopRatioDen])")
    }),
    "graft_fingerprint" -> ((es: Seq[Expression]) => TextFunctions.fingerprint(c(es.head))),
    "graft_rolling_hash" -> ((es: Seq[Expression]) => TextFunctions.rollingHash(c(es.head))),
    "graft_scrub_pii" -> ((es: Seq[Expression]) => TextFunctions.scrubPii(c(es.head))),
    "graft_shingles" -> ((es: Seq[Expression]) =>
      TextFunctions.shingles(c(es.head), litInt(es(1), "n"))),
    "graft_hash_bucket" -> ((es: Seq[Expression]) =>
      graft.ops.Sampling.hashBucket(c(es.head), litInt(es(1), "buckets"))),
    "graft_split_label" -> ((es: Seq[Expression]) => es match {
      case Seq(k) => graft.ops.Sampling.splitLabel(c(k))
      case Seq(k, t, v) => graft.ops.Sampling.splitLabel(c(k),
        litInt(t, "trainPct"), litInt(v, "validPct"))
      case _ => throw new IllegalArgumentException("graft_split_label(key[, trainPct, validPct])")
    }),
    "vec_cosine" -> ((es: Seq[Expression]) =>
      VectorFunctions.cosineNative(c(es.head), c(es(1)))),
    "vec_l2_norm" -> ((es: Seq[Expression]) => VectorFunctions.l2NormNative(c(es.head)))
  ).map { case (n, b) => n -> ((es: Seq[Expression]) => GraftColumnBridge.expression(b(es))) }

  /** Programmatic per-session registration (the non-extensions path).
    * vec_cosine/vec_l2_norm compose the native VecDot, so its
    * registration rides along. */
  def register(spark: SparkSession): Unit = {
    VecExpressions.register(spark)
    TextExpressions.register(spark)
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
