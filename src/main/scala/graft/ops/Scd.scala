package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build — the dbt-snapshot
  * shape the reference's delegated-SQL layer would reach for (the
  * reference snapshots woo/okta entities by full reload; an SCD2
  * history is the standard warehouse upgrade of that pattern).
  *
  * Semantics: given a change stream (key, ts, state), collapse each
  * run of consecutive identical states per key into one validity
  * interval `[valid_from, valid_to)`; `valid_to` is the next run's
  * start (NULL on the current row), `is_current` marks the open row,
  * `version` numbers runs per key from 1.
  *
  * Scale shape: everything is keyed by `key` — the lag/run-id window,
  * the per-run aggregate, and the lead window all cluster on the same
  * key, so Catalyst plans ONE hash exchange and reuses it across all
  * three (pinned in PlanShapeSpec). No global window, no driver
  * iteration; parallelism is the number of keys at any SF.
  *
  * Determinism: run boundaries are decided by `lag` over
  * (ts, tieBreak) — the explicit tie-break makes equal-timestamp
  * streams reproducible across engines and partitionings.
  */
object Scd {

  /** Build the SCD2 interval table from a change stream.
    *
    * @param df       change stream
    * @param key      entity key column name
    * @param ts       change timestamp column name
    * @param tieBreak total-order tie-break column name (e.g. event id)
    * @param state    tracked attribute column name
    */
  def scd2FromEvents(df: DataFrame, key: String, ts: String,
                     tieBreak: String, state: String): DataFrame = {
    val order = Seq(col(ts), col(tieBreak))
    val wOrd  = Window.partitionBy(col(key)).orderBy(order: _*)
    val wRun  = Window.partitionBy(col(key)).orderBy(col("version"))
    val runs = df
      .withColumn("__chg",
        when(lag(col(state), 1).over(wOrd).isNull ||
             lag(col(state), 1).over(wOrd) =!= col(state), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("version",
        sum(col("__chg")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("version"))
      .agg(first(col(state)).as(state), min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_events"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col("version"), col(state), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_events"))
  }
}
