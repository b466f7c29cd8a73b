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

  /** Run a DELIBERATE checkpoint-release block with the known
    * "lineage has been truncated" WARN quieted (every unpersist of a
    * localCheckpoint RDD logs it — here it is the exact intent),
    * restoring the previous level after. Scoping the quieting to the
    * release call sites (instead of the old session-global silence in
    * Tables.tune, r16 advice) keeps the same warning VISIBLE anywhere
    * else — where it genuinely signals lineage truncation on a block
    * something still needed. */
  def quietRelease[T](body: => T): T = {
    val logger = "org.apache.spark.rdd.MapPartitionsRDD"
    val prev = org.apache.logging.log4j.LogManager.getLogger(logger).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      logger, org.apache.logging.log4j.Level.ERROR)
    try body
    finally org.apache.logging.log4j.core.config.Configurator.setLevel(logger, prev)
  }

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
    quietRelease {
      (mid -- before).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    }
    out
  }

  /** Fully release a frame returned by the graph operators: the
    * CacheManager entry if it is `.cache()`-backed, plus the
    * checkpoint RDD at any LogicalRDD leaf (`Dataset.unpersist` is a
    * silent no-op on a checkpointed frame). Safe on any frame —
    * non-persisted leaves are untouched. */
  def release(df: DataFrame): Unit = quietRelease {
    df.unpersist(blocking = true)
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = true)
      case _ => ()
    }
  }
}
