package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test /
  * Great-Expectations contract family): each rule reduces to a
  * violation COUNT, and the audit is the union of rule results — the
  * gate a load pipeline evaluates before publishing a snapshot
  * (pairs with [[ManifestSwap]]: publish only on a green audit).
  *
  * Violation semantics follow SQL test conventions:
  *  - uniqueness: rows beyond the first per key (Σ (cnt−1) over keys
  *    with cnt > 1), null keys exempt;
  *  - referential integrity: child rows whose non-null key misses the
  *    parent (anti-join; null FKs exempt, as in SQL FK constraints);
  *  - predicate ("expect"): rows where the predicate is NOT true
  *    (null predicate counts as a violation — unknown fails a check).
  *
  * Plan shapes: uniqueness is a two-level hash agg; RI is a plain
  * anti-join (AQE broadcasts a dimension-sized parent, shuffles a
  * fact-sized one); predicates are map-only counts. Every rule output
  * is one row, so the audit union is driver-trivial at any scale. */
object Expectations {

  /** One rule result: (rule, n_violations, passed). */
  private def result(name: String, count: DataFrame): DataFrame =
    count.select(lit(name).as("rule"),
      col("n").cast("long").as("n_violations"),
      (col("n") === 0L).as("passed"))

  /** Duplicate-key rows beyond the first occurrence per key. */
  def expectUnique(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    result(name,
      df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n")))

  /** Child rows whose non-null key has no parent row. */
  def expectRef(name: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame =
    result(name,
      child.filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n")))

  /** k-anonymity: rows whose quasi-identifier combination appears in
    * fewer than k records — each is re-identifiable within its
    * equivalence class (Sweeney 2002). Null quasi-identifier values
    * form their own class (NULL-safe grouping, the SQL GROUP BY rule).
    * One hash aggregate + a count rollup; at 100 TB the class table is
    * the aggregate output, never the raw rows. */
  def expectKAnonymity(name: String, df: DataFrame, quasiCols: Seq[String],
                       k: Long): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    result(name,
      df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") < k)
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("n")))
  }

  /** Rows where the predicate is not TRUE (null = violation). */
  def expect(name: String, df: DataFrame, predicate: Column): DataFrame =
    result(name,
      df.agg(sum(when(predicate, 0L).otherwise(1L)).as("n"))
        .select(coalesce(col("n"), lit(0L)).as("n")))

  /** The audit: union of rule results in the given order. */
  def audit(rules: Seq[DataFrame]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    rules.reduce(_ unionByName _)
  }
}
