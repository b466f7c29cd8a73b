package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over keyed event streams: gap-based
  * sessionization, first-order (Markov) transition statistics, and
  * fixed-step gap-fill with last-observation-carried-forward.
  *
  * Scale notes (100 TB): every operator here is a single window pass
  * partitioned by the entity key — one hash shuffle on the key, then
  * a per-partition sort. No driver-side state, no collect. Key
  * cardinality (users, series) is the parallelism unit, so skewed
  * entities (one user with 10^8 events) are the hazard; sessionize and
  * transitions only need (ts, tie, state) per row, so project early —
  * the sort buffer per key stays a few bytes per event.
  *
  * Determinism: all orderings take an explicit unique tie-break column
  * so same-timestamp events sort identically in any engine; emitted
  * ratios are single IEEE divisions of exact integer counts (bit-equal
  * across engines); no floating accumulation anywhere.
  */
object TimeSeries {

  /** Assign gap-based sessions: a new session starts when the time
    * since the previous event of the same key exceeds `gapSeconds`.
    * Output: input columns + `session_id` (1-based, per key, in event
    * order). The canonical sessionization used by web analytics; the
    * reference's event pipeline leaves this to its warehouse layer
    * (dot/transforms SQL); here it is one window pass.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // Gap test in exact microseconds: timestamp -> long is epoch-micros
    // arithmetic in Spark, no float rounding at any scale.
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull, 1L)
      .when(unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session rollup on top of [[sessionize]]: one row per (key,
    * session) with event count, span, and first/last state. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, stateCol: String, gapSeconds: Long): DataFrame = {
    val sess = sessionize(events, keyCol, tsCol, tieCol, gapSeconds)
    val w = Window.partitionBy(col(keyCol), col("session_id"))
      .orderBy(col(tsCol), col(tieCol))
    sess
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        max(when(col("__rn") === 1, col(stateCol))).as("first_state"),
        max(struct(col("__rn"), col(stateCol))).getField(stateCol).as("last_state"))
  }

  /** First-order transition statistics: for each ordered adjacent pair
    * of states within a key, the transition count and its probability
    * among all transitions leaving `from_state`. The probability is a
    * single IEEE division of two exact counts — bit-identical in any
    * engine. Rows never cross keys (lead is per-key).
    */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("from_state"))
    counts
      .withColumn("n_from", sum(col("n")).over(totals))
      .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
  }

  /** Fixed-step gap-fill with LOCF: bucket events to `stepSeconds`,
    * aggregate per (key, bucket), then produce one row per key per step
    * between that key's first and last bucket — missing buckets carry
    * the last observed aggregate forward and are flagged
    * `observed = false`.
    *
    * The spine is `sequence(min, max, step)` exploded per key — pure
    * generate, no driver loop; its size is (span/step)·keys, which is
    * the OUTPUT size, so it cannot blow up beyond what the caller asked
    * for. LOCF is one running `last(ignoreNulls)` window per key.
    *
    * @param aggs aggregate columns over the raw events within a bucket
    *             (must be exact/deterministic if the result is gated).
    */
  def gapFillLocf(events: DataFrame, keyCol: String, tsCol: String,
                  stepSeconds: Long, aggs: Seq[Column],
                  locfCols: Seq[String]): DataFrame = {
    val step = stepSeconds * 1000000L // micros
    // Exact long arithmetic (Column `/` on longs is DOUBLE division,
    // whose rounding at a bucket boundary could disagree with an
    // engine doing integer floor); epoch-micros are positive so
    // subtract-pmod == floor-to-step.
    val micros = unix_micros(col(tsCol))
    val bucket = timestamp_micros(micros - pmod(micros, lit(step)))
    val observed = events
      .withColumn("bucket", bucket)
      .groupBy(col(keyCol), col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
    val spine = observed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("bucket"))
    val joined = spine.join(observed, Seq(keyCol, "bucket"), "left")
      .withColumn("observed", observed.columns
        .find(c => c != keyCol && c != "bucket")
        .map(c => col(c).isNotNull).getOrElse(lit(true)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    locfCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Cohort retention matrix — the classic product-analytics rollup:
    * users grouped by first-activity bucket (cohort), each later
    * bucket of activity counted at its offset, cells = distinct active
    * users. Buckets are integer epoch-day div `bucketDays` (no
    * calendar/locale rules — the same arithmetic in every engine);
    * offset 0 is the cohort bucket itself, so cell(c, 0) = cohort
    * size. bucketDays = 7 gives the classic weekly matrix.
    *
    * Plan shape: first-seen is a (user) hash agg; activity weeks a
    * (user, week) hash agg; the offset join keys on user (fact-fact
    * shuffle, AQE-sized) and the final cell agg is a standard partial
    * distinct. Nothing is windowed — at 100 TB every stage is a plain
    * combine-friendly aggregate. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be positive, got $bucketDays")
    val withWeek = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__d", col(tsCol).cast("date"))
      .withColumn("__week",
        expr(s"datediff(__d, DATE '1970-01-01') div $bucketDays").cast("long"))
    val firstSeen = withWeek.groupBy(col(userCol))
      .agg(min(col("__week")).as("cohort_bucket"))
    val active = withWeek.select(col(userCol), col("__week")).distinct()
    active.join(firstSeen, Seq(userCol))
      .withColumn("bucket_offset", (col("__week") - col("cohort_bucket")).cast("long"))
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Offline CUSUM changepoint estimate per key (Page 1954, the
    * classic single-changepoint location statistic): with integer
    * observations x_1..x_n in event order, the mean-centered running
    * sum S_k = Σ_{i≤k}(x_i − x̄) = n·P_k − k·T (P_k prefix sum, T the
    * series total — the ×n clearing keeps EVERYTHING integer, no mean
    * division anywhere), and the estimated changepoint is
    * argmax_k |S_k| with smallest-k ties. Emits per key:
    * (key, n_points, cp_pos, cusum_abs_max) where cusum_abs_max is
    * max |S_k| in the ×n units.
    *
    * Plan shape: ONE window pass per key (prefix sum + position + the
    * per-key n/T as unbounded-frame aggregates in the same pass), then
    * a per-key max_by argmax aggregate — no self-join, no global
    * window; per-key data never leaves its partition between the two. */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: Column): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .withColumn("__x", valueCol.cast("long"))
      // null ts would sort NULLS FIRST here but NULLS LAST in other
      // engines — excluded rather than engine-ambiguous
      .filter(col(keyCol).isNotNull && col("__x").isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("__p", sum(col("__x")).over(wOrd))
      .withColumn("__k", count(lit(1)).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("__x")).over(wAll))
      .withColumn("__s", abs(col("__n") * col("__p") - col("__k") * col("__t")))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_points"),
        max_by(col("__k"), struct(col("__s"), -col("__k"))).as("cp_pos"),
        max(col("__s")).as("cusum_abs_max"))
  }

  /** Dominant periodicity per key via the autocorrelation numerator at
    * lags 1..maxLag: R(ℓ) = Σ_{i≤n−ℓ} (n·x_i − T)(n·x_{i+ℓ} − T) —
    * mean-centering cleared by ×n (the [[cusumChangepoint]] trick), so
    * each term is an exact long product; the SUM rides DECIMAL(38,0)
    * because Σ over a long series exceeds long range (n·|x| ~ 8·10⁷
    * per factor at sf0.1 → term ~ 6·10¹⁵, sum ~ 10¹⁹+). Output per
    * key: (key, n_points, best_lag, r_positive) with best_lag =
    * argmax_ℓ R(ℓ), smallest-ℓ ties — the magnitudes stay internal
    * (they compare exactly in any engine's wide-integer type but do
    * not fit an emitted BIGINT).
    *
    * Plan: ONE window pass computes all maxLag leads + n + T, a
    * map-only unpivot emits (key, lag, term) rows, then a hash agg
    * per (key, lag) and a per-key argmax — no self-join per lag. */
  def periodicity(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valueCol: Column, maxLag: Int = 4): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive, got $maxLag")
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = events
      .withColumn("__x", valueCol.cast("long"))
      .filter(col(keyCol).isNotNull && col("__x").isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("__x")).over(wAll))
      .withColumn("__c", col("__n") * col("__x") - col("__t"))
    val withLeads = (1 to maxLag).foldLeft(base) { (df, l) =>
      df.withColumn(s"__lead$l", lead(col("__c"), l).over(wOrd))
    }
    val terms = withLeads.select(col(keyCol), col("__n"),
      explode(array((1 to maxLag).map(l =>
        struct(lit(l).as("lag"),
          (col("__c") * col(s"__lead$l")).as("term"))): _*)).as("p"))
      .select(col(keyCol), col("__n"), col("p.lag"), col("p.term"))
      .filter(col("term").isNotNull)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    terms.groupBy(col(keyCol), col("lag"))
      .agg(max(col("__n")).as("__n"), sum(col("term").cast(dec)).as("__r"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_points"),
        max_by(col("lag"), struct(col("__r"), -col("lag"))).as("best_lag"),
        max(col("__r")).as("__rbest"))
      .withColumn("r_positive", col("__rbest") > 0)
      .drop("__rbest")
  }

  /** Multi-touch LINEAR attribution: every touch event of the same
    * user strictly before a conversion and within `windowUs` shares
    * the conversion's credit equally — the equal-weight sibling of the
    * q42 as-of (last-touch) model. Credits are exact e6 integers that
    * CONSERVE: each touch gets ⌊10⁶/k⌋ and the most recent touch
    * (latest ts, then highest id — the deterministic remainder rule)
    * absorbs 10⁶ − k·⌊10⁶/k⌋, so Σ credit per conversion is exactly
    * 10⁶ (spec-pinned invariant; floored shares alone would leak
    * credit). Conversions with no touch in window emit nothing.
    *
    * Scale shape: the touch×conversion pair generation is the q43
    * bucketed range join specialized to per-user point-in-window — a
    * conversion's window explodes to ≤ windowUs/bucketUs + 1 bucket
    * keys, touches carry one, the join runs on (user, bucket) and an
    * exact range filter, never a per-user cross product. The k-count
    * and remainder rank are windows partitioned by conversion id.
    * Output: (conv_id, touch_id, touch_us, k, credit_e6). */
  def linearAttribution(events: DataFrame, userCol: String, idCol: String,
                        tsCol: String, typeCol: String, convType: String,
                        touchTypes: Seq[String], windowUs: Long,
                        bucketUs: Long): DataFrame = {
    require(windowUs > 0 && bucketUs > 0, s"need positive window/bucket, got $windowUs/$bucketUs")
    val base = events.select(col(userCol).as("__u"), col(idCol).as("__id"),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__ty"))
      .filter(col("__u").isNotNull && col("__us").isNotNull)
    val conv = base.filter(col("__ty") === convType)
      .select(col("__u"), col("__id").as("conv_id"), col("__us").as("__cus"))
      .withColumn("__bkt", explode(expr(
        s"sequence((__cus - ${windowUs}L) DIV ${bucketUs}L, __cus DIV ${bucketUs}L)")))
    val touch = base.filter(col("__ty").isin(touchTypes: _*))
      .select(col("__u"), col("__id").as("touch_id"), col("__us").as("touch_us"))
      .withColumn("__bkt", expr(s"touch_us DIV ${bucketUs}L"))
    val pairs = touch.join(conv, Seq("__u", "__bkt"))
      .filter(col("touch_us") < col("__cus") &&
        col("touch_us") >= col("__cus") - lit(windowUs))
    val wk = Window.partitionBy(col("conv_id"))
    val wr = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_us").desc, col("touch_id").desc)
    pairs
      .withColumn("k", count(lit(1)).over(wk))
      .withColumn("__rn", row_number().over(wr))
      .withColumn("credit_e6",
        expr("CAST(1000000 DIV k AS BIGINT)") +
          when(col("__rn") === 1, lit(1000000L) - col("k") * expr("1000000 DIV k"))
            .otherwise(lit(0L)))
      .select(col("conv_id"), col("touch_id"), col("touch_us"), col("k"),
        col("credit_e6"))
  }

  /** Position-based ("U-shaped") attribution — the 40/20/40 industry
    * convention: the FIRST and LAST touch in window each take
    * firstMilli/lastMilli (‰ of the conversion's credit), the middle
    * touches split the remainder equally. Same pair machinery and the
    * same exact-conservation discipline as [[linearAttribution]]:
    * middles take ⌊rem/ (k−2)⌋ each and the touch just before the last
    * (the latest middle) absorbs the division remainder, so Σ credit
    * per conversion is exactly 10⁶ (spec-pinned). Degenerate shapes
    * follow the convention: k = 1 → the only touch takes everything;
    * k = 2 → the first touch takes exactly firstMilli·10³ and the
    * LAST touch takes lastMilli·10³ PLUS the entire middle pot (the
    * recency rule: last touch absorbs the pot on top of its own
    * share — with 100/100 permille that's 100000/900000, NOT a 1:1
    * rescale; the defaults 400/400 give 400000/600000). The gate
    * covers only the 400/400 defaults (the oracle inlines them);
    * non-default weights are spec-covered, not oracle-gated. Output:
    * (conv_id, touch_id, touch_us, k, position, credit_e6) with
    * position ∈ first|middle|last. */
  def positionAttribution(events: DataFrame, userCol: String, idCol: String,
                          tsCol: String, typeCol: String, convType: String,
                          touchTypes: Seq[String], windowUs: Long, bucketUs: Long,
                          firstMilli: Int = 400, lastMilli: Int = 400): DataFrame = {
    require(firstMilli >= 0 && lastMilli >= 0 && firstMilli + lastMilli <= 1000,
      s"first/last permille must be non-negative and sum <= 1000, got $firstMilli/$lastMilli")
    val base = linearAttribution(events, userCol, idCol, tsCol, typeCol,
      convType, touchTypes, windowUs, bucketUs)
      .drop("credit_e6")
    val wAsc = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_us").asc, col("touch_id").asc)
    val firstE6 = firstMilli * 1000L
    val lastE6 = lastMilli * 1000L
    val midPot = 1000000L - firstE6 - lastE6
    base
      .withColumn("__rn", row_number().over(wAsc))
      .withColumn("position",
        when(col("__rn") === 1, "first")
          .when(col("__rn") === col("k"), "last")
          .otherwise("middle"))
      // middles take ⌊midPot/(k−2)⌋; the LATEST middle (rn = k−1)
      // absorbs the division remainder so the pot never leaks.
      // greatest(…,1) keeps the (unused) k ≤ 2 branches from tripping
      // ANSI divide-by-zero — CASE arms all evaluate under codegen
      .withColumn("__mid", expr(s"CAST($midPot DIV greatest(k - 2, 1) AS BIGINT)"))
      .withColumn("credit_e6",
        when(col("k") === 1, lit(1000000L))
          .when(col("k") === 2,
            when(col("position") === "first", lit(firstE6))
              .otherwise(lit(lastE6 + midPot)))
          .otherwise(when(col("position") === "first", lit(firstE6))
            .when(col("position") === "last", lit(lastE6))
            .otherwise(col("__mid") +
              when(col("__rn") === col("k") - 1,
                lit(midPot) - (col("k") - 2) * col("__mid")).otherwise(lit(0L)))))
      .select(col("conv_id"), col("touch_id"), col("touch_us"), col("k"),
        col("position"), col("credit_e6"))
  }

  /** Exponentially-weighted drift detector over keyed event series —
    * the online metric-drift monitor (Roberts 1959 EWMA control chart,
    * finite-horizon form). Each event's value (milli-quantized before
    * anything else, the house rule) is compared against the
    * exponentially-weighted mean of its `window` PREDECESSORS with
    * decay 3/4: weight for the value `age+1` steps back is
    * 3^age·4^(window−1−age) — the geometric weights (3/4)^age cleared
    * of fractions by the common denominator 4^(window−1), so numerator
    * and denominator are EXACT longs and the flag decision is an
    * integer cross-multiplication no engine can round differently.
    * Truncating the classic infinite EWMA at `window` terms changes the
    * weights by < (3/4)^window (< 10% mass at the default 8) and is
    * what makes the recurrence a stock window expression instead of a
    * sequential scan: lag(k) columns over ONE key-partitioned sort,
    * the [[sessionize]] scale shape.
    *
    * A row drifts when its value more than doubles or falls below half
    * of the weighted mean: v·den > 2·num or 2·v·den < num (missing
    * predecessors just drop out of both sums; rows with NO predecessor
    * have den = 0 and never flag). Output: key, id, ts, v_milli,
    * ewma_milli (sign-safe floor of num/den, NULL when den = 0),
    * drift (0/1).
    *
    * Scaladoc note vs reference: the reference's failure monitor
    * re-reads full history per poll (SURVEY.md §2.9 tallies); the
    * control-chart form is one pass and maintains under append. */
  def ewmaDrift(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
                value: Column, window: Int = 8): DataFrame = {
    require(window >= 1 && window <= 16,
      s"window must be in [1,16] (4^15 weight headroom in a long), got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    // floor, not cast-truncation: cast rounds toward zero, so negative
    // values would quantize one milli high vs the house FLOOR rule (and
    // the q192 oracle's FLOOR) — the fixture is all-positive, so only
    // floor keeps the latent negative-value path aligned
    val v = floor(value * 1000).cast("long")
    // one projection carries ALL the lag expressions so Catalyst plans
    // a single Window node (deriving num and den directly from lag()
    // calls makes it split them into two Windows, each re-evaluating
    // every lag — PlanShapeSpec pins the single-pass shape)
    val weights = (0 until window).map { age =>
      (BigInt(3).pow(age) * BigInt(4).pow(window - 1 - age)).toLong
    }
    val withLags = events.withColumn("v_milli", v)
      .select(col("*") +: (0 until window).map(age =>
        lag(col("v_milli"), age + 1).over(w).as(s"__l$age")): _*)
    val num = weights.zipWithIndex.map { case (wt, age) =>
      coalesce(col(s"__l$age") * lit(wt), lit(0L))
    }.reduce(_ + _)
    val den = weights.zipWithIndex.map { case (wt, age) =>
      when(col(s"__l$age").isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    // all floor/compare arithmetic in DecimalType(38,0): long/long
    // division promotes to double (exact only below 2^53 — window=16
    // weights reach 4^15, putting __num past that for plausible
    // v_milli), and the drift cross-multiplications can overflow a
    // long in the same regime. Decimal is the Stats.floorDiv pattern.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dnum = col("__num").cast(dec)
    val dden = col("__den").cast(dec)
    val dv = col("v_milli").cast(dec)
    withLags
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("ewma_milli",
        when(col("__den") > 0L,
          (dnum - pmod(dnum, dden)) / dden)
          .cast("long"))
      .withColumn("drift",
        when(col("__den") > 0L &&
          (dv * dden > dnum * 2 || dv * dden * 2 < dnum), 1)
          .otherwise(0))
      .select(col(keyCol), col(idCol), col(tsCol), col("v_milli"),
        col("ewma_milli"), col("drift"))
  }
}
