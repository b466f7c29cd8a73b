package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistence bookkeeping for the iterative graph operators
  * ([[PageRank]] / [[LabelProp]] / [[Bfs]] / the CC rounds in Dedup).
  *
  * Those loops materialize per-round state (localCheckpoint by
  * default) plus an |E|-sized partitioned edge checkpoint
  * ([[ShuffleSizing.partitionedMaterialize]]). A checkpointed Dataset
  * exposes no `unpersist`, so without explicit disposal every call
  * leaked the edge footprint for the session lifetime (r15 advice).
  * The contract enforced here: ONLY the returned frame stays
  * persisted, and that frame is SELF-CONTAINED — its lineage is cut
  * with one final materialization BEFORE the intermediates are
  * released, so a recomputed partition never chases freed checkpoint
  * blocks (the r15 Bfs lineage finding).
  *
  * Sequential-only, like the AQE flip in
  * [[ShuffleSizing.partitionedMaterialize]]: the registry diff would
  * misattribute RDDs persisted concurrently by other queries on the
  * same session. Fine under the strictly-sequential harnesses
  * (Verify/Bench/tests); a shared-session concurrent caller should
  * pass an identity/parquet `materialize` instead. */
private[graft] object CacheHygiene {

  /** Run `body`, cut the returned frame's lineage with `finalCut`
    * (must be EAGER when it persists — the default localCheckpoint
    * is), then release every persistent RDD `body` registered. With a
    * non-persisting `materialize` (identity, parquet checkpoint) the
    * diff is empty and this is a pass-through. */
  def scoped(spark: SparkSession)(body: => DataFrame)(
      finalCut: DataFrame => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out0 = body
    val mid = sc.getPersistentRDDs.keySet.toSet
    val out = finalCut(out0)
    (mid -- before).foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    out
  }

  /** Fully release a frame returned by the graph operators: the
    * CacheManager entry if it is `.cache()`-backed, plus the
    * checkpoint RDD at any LogicalRDD leaf (`Dataset.unpersist` is a
    * silent no-op on a checkpointed frame). Safe on any frame —
    * non-persisted leaves are untouched. */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = true)
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = true)
      case _ => ()
    }
  }
}
