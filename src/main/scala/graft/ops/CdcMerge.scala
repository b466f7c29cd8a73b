package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC / MERGE-style upsert apply over an immutable snapshot — the
  * warehouse `MERGE INTO` statement re-expressed for a copy-on-write
  * table layout (the reference applies the same semantics through
  * BigQuery MERGE in its incremental syncs; see okta-sync/main.py's
  * refresh flow and woo-sync's delete-then-insert batches).
  *
  * Semantics (full-row upserts): `changes` carries one row per key with
  * `op` ∈ {"U", "D"} — U replaces the base row (insert if absent), D
  * removes it. Keys absent from `changes` pass through untouched.
  *
  * Scale shape: the base table is touched by exactly ONE operator — a
  * LEFT ANTI join against the change-key set. The join carries NO
  * forced broadcast hint: in the normal CDC regime (a ~1e3–1e6-key
  * batch against a ~1e10-row base) Spark's size estimate / AQE runtime
  * stats pick a broadcast anti join, so the base never shuffles and
  * upserts ride in as a cheap union of the small side; if a change
  * batch ever outgrows the broadcast threshold, AQE falls back to a
  * shuffled anti join — graceful, not a driver OOM (a forced hint would
  * broadcast regardless of size). This is deliberately NOT a full-outer
  * join: full outer can't broadcast and would shuffle the entire base
  * on every batch.
  *
  * Determinism: `changes` must be key-unique (enforce upstream with
  * keep-latest dedup, Relational.latestByKey) — with a unique key per
  * change row the result is set-deterministic regardless of
  * partitioning.
  */
object CdcMerge {

  /** Apply a key-unique change batch to `base`. `changes` must contain
    * `key`, `op`, and every base column for its "U" rows (full-row
    * upsert). */
  def mergeApply(base: DataFrame, changes: DataFrame, key: String,
                 op: String = "op"): DataFrame = {
    val cols = base.columns.toSeq
    val touched = changes.select(col(key))
    val upserts = changes.filter(col(op) === "U").select(cols.map(col): _*)
    // no broadcast() hint: let size stats / AQE choose, so an oversized
    // batch degrades to a shuffled anti join instead of driver OOM
    base.join(touched, Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
