package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (the IVM kernel): keep a grouped
  * count/sum aggregate current under a CDC delta WITHOUT rescanning
  * the base table — the only viable refresh strategy when the base is
  * 100 TB and the delta is a day's arrivals.
  *
  * Count and sum are the self-maintainable aggregates (Gupta &
  * Mumick's classic result): state (group, cnt, total) merges with a
  * delta by pure arithmetic — inserts add, deletes subtract, an update
  * is the standard D+I pair — so the refresh is one hash aggregate
  * over the DELTA plus a full-outer merge join against state on the
  * group key. min/max are NOT self-maintainable under deletes (a
  * deleted extremum can force a rescan); [[IncrementalMinMax]] keeps
  * them incremental via bounded per-group reserves with a per-group
  * rescan only on the rare reserve eviction.
  *
  * Correctness contract (the q135 gate): merge(aggregate(base), delta)
  * ≡ aggregate(base − deletes + inserts), bit-exactly — totals ride
  * DECIMAL(38,0)-exact long arithmetic, groups whose count reaches 0
  * leave the state (so repeated maintenance never accretes dead
  * groups). One documented deviation: a group whose values are ALL
  * null carries total = 0 after a merge where SQL SUM says NULL — the
  * plain (cnt, total) state cannot tell "sums to zero" from "no
  * values". Callers needing SUM-null fidelity use the moments state,
  * whose `nval` disambiguates ([[momentStats]] nulls such totals).
  *
  * Scale shape: state is aggregate-sized (groups, not rows); the delta
  * agg is map-side combined; the merge joins aggregate-sized frames on
  * the group key — AQE broadcasts whichever side is small. The base
  * table appears NOWHERE in the maintenance plan.
  */
object IncrementalAgg {

  /** Build the initial state: (group..., cnt, total). */
  def aggState(base: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol).cast("long")).as("total"))

  /** 'I'/'D' → ±1, failing closed on an unknown op — silently skipping
    * a malformed CDC row would corrupt the state forever. The sign
    * kernel shared by every IVM merge ([[mergeDelta]],
    * [[mergeDeltaMoments]], [[IncrementalMinMax.mergeDelta]]). */
  private[ops] def cdcSign(opCol: String): Column =
    when(col(opCol) === "I", 1L)
      .when(col(opCol) === "D", -1L)
      .otherwise(raise_error(concat(lit("unknown CDC op: "), col(opCol).cast("string")))
        .cast("long"))

  /** Null-safe (<=>) equi-condition between two aliased frames over
    * the group key. NULL group keys are one SQL GROUP BY group, so
    * every IVM merge join must be null-safe — a plain equi-join would
    * keep a NULL state row and a NULL delta row apart and accrete
    * duplicates. Explicit aliases because state and delta routinely
    * share lineage (both derived from the same table), which an
    * unqualified condition trips as an ambiguous self-join. */
  private[ops] def keyCond(left: String, right: String, cols: Seq[String]): Column =
    cols.map(c => col(s"$left.$c") <=> col(s"$right.$c")).reduce(_ && _)

  /** Apply a CDC delta: `opCol` is 'I' (insert) or 'D' (delete); an
    * update arrives as its D+I pair. Returns the refreshed state. */
  def mergeDelta(state: DataFrame, delta: DataFrame, groupCols: Seq[String],
                 valueCol: String, opCol: String): DataFrame = {
    val d = delta
      .withColumn("__sign", cdcSign(opCol))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dcnt"),
        sum(col("__sign") * col(valueCol).cast("long")).as("__dtotal"))
    val cond = keyCond("__ivm_s", "__ivm_d", groupCols)
    state.alias("__ivm_s").join(d.alias("__ivm_d"), cond, "full_outer")
      .select(groupCols.map(c =>
        coalesce(col(s"__ivm_s.$c"), col(s"__ivm_d.$c")).as(c)) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dcnt"), lit(0L))).as("cnt"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("__dtotal"), lit(0L))).as("total")): _*)
      .filter(col("cnt") =!= 0L)
  }

  // ---- algebraic moments (avg / variance) -----------------------------------

  private val dec38 = "DECIMAL(38,0)"

  /** Moments state: (group..., cnt, nval, total, totalsq) — row count,
    * non-null value count, Σv, Σv² — ALL self-maintainable under
    * inserts AND deletes (they are sums, Gupta & Mumick's algebraic
    * class), so avg and variance stay incremental with no reserve or
    * rescan machinery at all. Σv² rides DECIMAL(38,0): quantized
    * values square into magnitudes a long cannot carry at warehouse
    * row counts, and decimal overflow fails loudly instead of
    * wrapping. */
  def aggStateMoments(base: DataFrame, groupCols: Seq[String],
                      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), count(v).as("nval"),
        sum(v).as("total"),
        sum((v.cast(dec38) * v).cast(dec38)).as("totalsq"))
  }

  /** Apply a CDC delta to a moments state — the [[mergeDelta]] kernel
    * with the two extra sums. */
  def mergeDeltaMoments(state: DataFrame, delta: DataFrame, groupCols: Seq[String],
                        valueCol: String, opCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val d = delta
      .withColumn("__sign", cdcSign(opCol))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dcnt"),
        sum(when(v.isNotNull, col("__sign")).otherwise(0L)).as("__dnval"),
        sum(col("__sign") * v).as("__dtotal"),
        sum((col("__sign").cast(dec38) * v.cast(dec38) * v).cast(dec38)).as("__dtotalsq"))
    val cond = keyCond("__ivm_s", "__ivm_d", groupCols)
    state.alias("__ivm_s").join(d.alias("__ivm_d"), cond, "full_outer")
      .select(groupCols.map(c =>
        coalesce(col(s"__ivm_s.$c"), col(s"__ivm_d.$c")).as(c)) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dcnt"), lit(0L))).as("cnt"),
        (coalesce(col("nval"), lit(0L)) + coalesce(col("__dnval"), lit(0L))).as("nval"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("__dtotal"), lit(0L))).as("total"),
        (coalesce(col("totalsq"), lit(0L).cast(dec38)) +
          coalesce(col("__dtotalsq"), lit(0L).cast(dec38))).cast(dec38).as("totalsq")): _*)
      .filter(col("cnt") =!= 0L)
  }

  /** The maintained algebraic view: (group..., cnt, nval, total,
    * avg_milli, var_e6) — population mean in exact milli-quanta and
    * population variance in exact 10⁻⁶ quanta, both by integer floor
    * division over the maintained sums (n·Σv² − (Σv)²) / n², so the
    * incremental view hash-matches a from-scratch recompute. Groups
    * with no non-null value emit null total and null stats (SQL SUM
    * semantics — the merge arithmetic carries 0 internally for such
    * groups; nval is exactly the signal that distinguishes "sums to
    * zero" from "no values", which the plain count/sum state cannot). */
  def momentStats(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) ++ Seq(
      col("cnt"), col("nval"),
      when(col("nval") > 0, col("total")).as("total"),
      // FLOOR division, not Spark's truncate-toward-zero DIV: the
      // contract is the mathematical floor for either sign of the
      // maintained total. pmod(a, b) with b > 0 is in [0, b), so
      // (a − pmod(a, b)) is exactly divisible and the DIV is the floor.
      // NOTE DuckDB's integer // ALSO truncates toward zero (q170
      // lesson), so the q146 oracle applies the same subtract-the-
      // positive-mod identity rather than a bare //. var_e6 needs no
      // adjustment — its numerator is non-negative by Cauchy-Schwarz.
      when(col("nval") > 0,
        expr(s"""(1000 * CAST(total AS $dec38)
                |- pmod(1000 * CAST(total AS $dec38), CAST(nval AS $dec38)))
                |DIV CAST(nval AS $dec38)""".stripMargin)).as("avg_milli"),
      when(col("nval") > 0, expr(
        s"""(1000000 * (CAST(nval AS $dec38) * totalsq
            |- CAST(total AS $dec38) * CAST(total AS $dec38)))
            |DIV (CAST(nval AS $dec38) * CAST(nval AS $dec38))""".stripMargin))
        .as("var_e6")): _*)

  // ---- join-view maintenance ------------------------------------------------

  /** Join-view state for V = R ⋈ₖ S under the counting algorithm
    * (Gupta/Mumick/Subrahmanian 1993): per join key, the tuple COUNTS
    * of each side — (key..., cnt_r, cnt_s). Each count is a
    * self-maintainable sum, so the join view refreshes from DELTAS
    * ALONE; a key's contribution to |V| is cnt_r·cnt_s
    * ([[joinViewPairs]]). Keys alive on only ONE side stay in the
    * state with the other count 0 — a later insert on the empty side
    * revives the join row, which is exactly the case that makes naive
    * "store only view rows" maintenance wrong. */
  def joinViewState(r: DataFrame, s: DataFrame, keyCols: Seq[String]): DataFrame = {
    val cr = r.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt_r"))
      .withColumn("cnt_s", lit(0L))
    val cs = s.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt_s"))
      .withColumn("cnt_r", lit(0L))
    cr.unionByName(cs)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt_r")).as("cnt_r"), sum(col("cnt_s")).as("cnt_s"))
  }

  /** A maintained count floored at raise_error: a negative means the
    * CDC stream deleted tuples the state never saw — fail closed, the
    * [[IncrementalMinMax]] divergence rule. */
  private def nonNegative(c: Column, name: String): Column =
    when(c < 0L, raise_error(concat(
      lit(s"negative $name after join-view merge — CDC deletes exceed maintained "),
      lit("inserts (state/stream divergence)"))).cast("long"))
      .otherwise(c)

  /** Apply one CDC delta per side ('I'/'D' rows keyed like the bases;
    * either may be empty — pass a `limit(0)` frame). Pure arithmetic:
    * each delta hash-aggregates to net per-key counts (map-side
    * combined), unions with the state, and one hash aggregate on the
    * join key re-forms it — NO join in the maintenance plan and
    * neither base table anywhere. Cost: O(|ΔR| + |ΔS| + |state keys|)
    * however large R and S are — the only viable refresh when the
    * bases are 100 TB and a day's CDC is gigabytes. Keys whose both
    * counts reach 0 leave the state. */
  def mergeDeltaJoinView(state: DataFrame, deltaR: DataFrame, deltaS: DataFrame,
                         keyCols: Seq[String], opCol: String): DataFrame = {
    def netted(delta: DataFrame, mine: String, other: String): DataFrame = delta
      .withColumn("__sign", cdcSign(opCol))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign")).as(mine))
      .withColumn(other, lit(0L))
    state.select(keyCols.map(col) :+ col("cnt_r") :+ col("cnt_s"): _*)
      .unionByName(netted(deltaR, "cnt_r", "cnt_s"))
      .unionByName(netted(deltaS, "cnt_s", "cnt_r"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt_r")).as("__r"), sum(col("cnt_s")).as("__s"))
      .select(keyCols.map(col) ++ Seq(
        nonNegative(col("__r"), "cnt_r").as("cnt_r"),
        nonNegative(col("__s"), "cnt_s").as("cnt_s")): _*)
      .filter(col("cnt_r") =!= 0L || col("cnt_s") =!= 0L)
  }

  /** The materialized view the state maintains: per join key present on
    * BOTH sides, the join cardinality n_pairs = cnt_r·cnt_s (the
    * COUNT-projected equi-join; a general SPJ view maintains per-tuple
    * multiplicities with the same ± arithmetic). */
  def joinViewPairs(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.filter(col("cnt_r") > 0L && col("cnt_s") > 0L)
      .select(keyCols.map(col) ++ Seq(col("cnt_r"), col("cnt_s"),
        (col("cnt_r") * col("cnt_s")).as("n_pairs")): _*)

  /** SUM-over-join view state — the aggregate-projected SPJ view
    * V = SELECT key, SUM(r.v) FROM R JOIN S USING (key) GROUP BY key,
    * which factors per key as sum(r.v)·|S_key|: alongside the two
    * counts, maintain sum_rv = Σ of R's (pre-quantized long) value
    * column — also a self-maintainable signed sum, so the whole view
    * still refreshes from deltas alone ([[joinViewSums]] emits it).
    * Values must be exact longs (quantize floats FIRST, the
    * [[momentStats]] rule); null values sum as 0 but still count in
    * cnt_r, matching SQL SUM-ignores-NULL over a join that keeps the
    * row. */
  def joinViewSumState(r: DataFrame, s: DataFrame, keyCols: Seq[String],
                       valCol: String): DataFrame = {
    val cr = r.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt_r"),
        coalesce(sum(col(valCol).cast("long")), lit(0L)).as("sum_rv"))
      .withColumn("cnt_s", lit(0L))
    val cs = s.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt_s"))
      .withColumn("cnt_r", lit(0L)).withColumn("sum_rv", lit(0L))
    cr.unionByName(cs)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt_r")).as("cnt_r"), sum(col("sum_rv")).as("sum_rv"),
        sum(col("cnt_s")).as("cnt_s"))
  }

  /** Delta merge for [[joinViewSumState]] — identical shape to
    * [[mergeDeltaJoinView]] (union + ONE hash aggregate, neither base
    * in the plan): R-deltas carry the value column and net both a
    * signed count and a signed value sum; S-deltas net counts only.
    * Fail-closed rules: a negative count, or a key whose cnt_r
    * returned to 0 with a non-zero residual sum_rv (the CDC stream
    * deleted different values than it inserted), both raise — silent
    * divergence is the one unrecoverable IVM failure mode. */
  def mergeDeltaJoinViewSum(state: DataFrame, deltaR: DataFrame, deltaS: DataFrame,
                            keyCols: Seq[String], opCol: String,
                            valCol: String): DataFrame = {
    val nr = deltaR.withColumn("__sign", cdcSign(opCol))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign")).as("cnt_r"),
        coalesce(sum(col("__sign") * col(valCol).cast("long")), lit(0L)).as("sum_rv"))
      .withColumn("cnt_s", lit(0L))
    val ns = deltaS.withColumn("__sign", cdcSign(opCol))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign")).as("cnt_s"))
      .withColumn("cnt_r", lit(0L)).withColumn("sum_rv", lit(0L))
    state.select(keyCols.map(col) ++ Seq(col("cnt_r"), col("sum_rv"), col("cnt_s")): _*)
      .unionByName(nr).unionByName(ns)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt_r")).as("__r"), sum(col("sum_rv")).as("__v"),
        sum(col("cnt_s")).as("__s"))
      .select(keyCols.map(col) ++ Seq(
        nonNegative(col("__r"), "cnt_r").as("cnt_r"),
        when(col("__r") === 0L && col("__v") =!= 0L,
          raise_error(lit("residual sum_rv on a count-0 key after join-view merge " +
            "— CDC deletes carried different values than the maintained inserts " +
            "(state/stream divergence)")).cast("long"))
          .otherwise(col("__v")).as("sum_rv"),
        nonNegative(col("__s"), "cnt_s").as("cnt_s")): _*)
      .filter(col("cnt_r") =!= 0L || col("cnt_s") =!= 0L)
  }

  /** The maintained SUM-over-join view: per key alive on both sides,
    * sum_v = sum_rv·cnt_s — every S-side match replays R's group sum
    * once, exactly the SQL join semantics. */
  def joinViewSums(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.filter(col("cnt_r") > 0L && col("cnt_s") > 0L)
      .select(keyCols.map(col) ++ Seq(col("cnt_r"), col("cnt_s"),
        (col("sum_rv") * col("cnt_s")).as("sum_v")): _*)

  // ---- streaming maintenance -----------------------------------------------

  private[ops] def stateDir(root: String, id: Long) = f"$root/state_gen=$id%019d"

  private[ops] def fsOf(spark: org.apache.spark.sql.SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** COMMITTED generation ids only (job-commit `_SUCCESS` marker, the
    * CorpusIngest scanRoot rule) — a torn directory from a crash
    * mid-write can neither poison a read nor count as landed. */
  private[ops] def genIds(spark: org.apache.spark.sql.SparkSession,
                     root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("state_gen=") &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("state_gen=").toLong)
      .sorted
  }

  private def emptyState(like: DataFrame, groupCols: Seq[String]): DataFrame =
    like.select(groupCols.map(col) ++ Seq(
        lit(0L).as("cnt"), lit(0L).as("total")): _*)
      .limit(0)

  /** Apply one CDC micro-batch: merge into the newest COMMITTED state
    * generation STRICTLY OLDER than `batchId` and (over)write
    * generation `batchId`. Re-delivery of a batch id recomputes from
    * the same prior generation and overwrites the same directory —
    * idempotent under Structured Streaming's at-least-once foreachBatch
    * contract, the CorpusIngest `batch=<id>` landing rule applied to
    * aggregate state.
    *
    * stateRoot and the stream's checkpoint must live and die together:
    * a generation NEWER than the delivered batch id means the
    * checkpoint was reset against surviving state (batch ids restart
    * at 0 and would re-aggregate on top of a previous run) — that is
    * refused loudly rather than double-counted. Generations older than
    * the prior actually read are no longer needed for replay (only the
    * newest batch can be re-delivered) and are swept, so retention is
    * two generations, not O(batches). */
  def applyBatch(batch: DataFrame, batchId: Long, groupCols: Seq[String],
                 valueCol: String, opCol: String, stateRoot: String): Unit =
    landBatch(batch, batchId, stateRoot, emptyState(batch, groupCols),
      prior => mergeDelta(prior, batch, groupCols, valueCol, opCol))

  /** The generation-landing kernel shared by every streaming IVM shape
    * ([[applyBatch]], [[IncrementalMinMax.applyBatch]]): read the
    * newest COMMITTED generation strictly older than `batchId` (or the
    * caller's empty state), apply `merge`, (over)write generation
    * `batchId`, sweep generations older than the one read. */
  private[ops] def landBatch(batch: DataFrame, batchId: Long, stateRoot: String,
                             empty: => DataFrame,
                             merge: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val ids = genIds(spark, stateRoot)
    require(ids.forall(_ <= batchId),
      s"state root $stateRoot holds generation ${ids.last} ahead of batch $batchId — " +
        "the stream checkpoint was reset against surviving state; clear stateRoot " +
        "or restore the matching checkpoint (stateRoot and checkpointLocation " +
        "must live and die together)")
    val priorId = ids.filter(_ < batchId).lastOption
    val prior = priorId
      .map(id => spark.read.parquet(stateDir(stateRoot, id)))
      .getOrElse(empty)
    merge(prior).write.mode("overwrite").parquet(stateDir(stateRoot, batchId))
    // replay can only re-deliver THIS batch, which reads priorId —
    // everything older is dead weight
    val fs = fsOf(spark, stateRoot)
    ids.filter(id => priorId.exists(id < _)).foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(stateDir(stateRoot, id)), true)
    }
  }

  /** The maintained aggregate as of the newest committed generation
    * (empty-schema error if none exists yet). */
  def readState(spark: org.apache.spark.sql.SparkSession,
                stateRoot: String): DataFrame = {
    val ids = genIds(spark, stateRoot)
    require(ids.nonEmpty, s"no state generations under $stateRoot")
    spark.read.parquet(stateDir(stateRoot, ids.last))
  }

  /** Continuous maintenance from a CDC stream: every micro-batch is a
    * delta applied by [[applyBatch]]. The refresh cost per batch is
    * O(delta + |state|) with the base table nowhere in sight — the
    * streaming IVM shape. */
  def maintainStream(cdc: DataFrame, groupCols: Seq[String], valueCol: String,
                     opCol: String, stateRoot: String,
                     checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: java.lang.Long) =>
        applyBatch(batch.toDF(), batchId, groupCols, valueCol, opCol, stateRoot)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming join-view maintenance — [[mergeDeltaJoinView]] under the
    * same generation-landing contract as [[applyBatch]]. A micro-batch
    * carries BOTH bases' CDC rows in one frame, tagged 'R'/'S' by
    * `sideCol` (the natural shape when a CDC bus multiplexes tables
    * into one topic); an unknown side tag raises rather than silently
    * dropping rows, the [[cdcSign]] rule. Replay-idempotent and
    * reset-refusing exactly like the aggregate path — the landing
    * kernel is shared. */
  def applyBatchJoinView(batch: DataFrame, batchId: Long, keyCols: Seq[String],
                         opCol: String, sideCol: String, stateRoot: String): Unit = {
    val side = when(col(sideCol).isin("R", "S"), col(sideCol))
      .otherwise(raise_error(concat(
        lit("unknown join-view side tag: "), col(sideCol).cast("string"))))
    val emptyJv = batch.select(keyCols.map(col) ++ Seq(
        lit(0L).as("cnt_r"), lit(0L).as("cnt_s")): _*)
      .limit(0)
    landBatch(batch, batchId, stateRoot, emptyJv, prior =>
      mergeDeltaJoinView(prior,
        batch.filter(side === "R").select((keyCols :+ opCol).map(col): _*),
        batch.filter(side === "S").select((keyCols :+ opCol).map(col): _*),
        keyCols, opCol))
  }

  /** foreachBatch driver for [[applyBatchJoinView]]. */
  def maintainJoinViewStream(cdc: DataFrame, keyCols: Seq[String], opCol: String,
                             sideCol: String, stateRoot: String,
                             checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: java.lang.Long) =>
        applyBatchJoinView(batch.toDF(), batchId, keyCols, opCol, sideCol, stateRoot)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
