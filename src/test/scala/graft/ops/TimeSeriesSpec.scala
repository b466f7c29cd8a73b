package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (user, event_id, ts, state) — user 1 has a 90s gap splitting two
  // sessions; user 2 is one session; a same-timestamp pair checks the
  // tie-break.
  private lazy val events = Seq(
    (1L, 10L, "2024-01-01 00:00:00", "view"),
    (1L, 11L, "2024-01-01 00:00:30", "click"),
    (1L, 12L, "2024-01-01 00:02:00", "view"),     // 90s gap -> new session
    (1L, 13L, "2024-01-01 00:02:10", "purchase"),
    (2L, 20L, "2024-01-01 00:00:05", "view"),
    (2L, 22L, "2024-01-01 00:00:05", "error"),    // ts tie: event_id orders
    (2L, 21L, "2024-01-01 00:00:05", "click")
  ).toDF("user_id", "event_id", "ts_s", "state")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("sessionize splits on gap > threshold, per key, 1-based") {
    val out = TimeSeries.sessionize(events, "user_id", "ts", "event_id", 60L)
      .select("user_id", "event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 10L)) == 1L && out((1L, 11L)) == 1L)
    assert(out((1L, 12L)) == 2L && out((1L, 13L)) == 2L)
    assert(out((2L, 20L)) == 1L && out((2L, 21L)) == 1L && out((2L, 22L)) == 1L)
  }

  test("sessionStats rolls up count, span, first/last state with tie-break") {
    val out = TimeSeries.sessionStats(events, "user_id", "ts", "event_id",
        "state", 60L)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val Array(s11, s12, s21) = out
    assert(s11.getLong(0) == 1L && s11.getLong(1) == 1L)
    assert(s11.getAs[Long]("n_events") == 2L)
    assert(s11.getAs[String]("first_state") == "view")
    assert(s11.getAs[String]("last_state") == "click")
    assert(s12.getAs[Long]("n_events") == 2L)
    assert(s12.getAs[java.sql.Timestamp]("session_start") == ts("2024-01-01 00:02:00"))
    assert(s12.getAs[java.sql.Timestamp]("session_end") == ts("2024-01-01 00:02:10"))
    // user 2: three same-ts events — event_id 20 first, 22 last
    assert(s21.getAs[String]("first_state") == "view")
    assert(s21.getAs[String]("last_state") == "error")
  }

  test("transitions counts adjacent pairs per key and normalizes per from_state") {
    // user 1: view->click, click->view, view->purchase
    // user 2 (event_id order): view->click, click->error
    val out = TimeSeries.transitions(events, "user_id", "ts", "event_id", "state")
      .collect().map(r => (r.getAs[String]("from_state"), r.getAs[String]("to_state")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_from"), r.getAs[Double]("p"))).toMap
    assert(out(("view", "click")) == ((2L, 3L, 2.0 / 3.0)))
    assert(out(("view", "purchase")) == ((1L, 3L, 1.0 / 3.0)))
    assert(out(("click", "view")) == ((1L, 2L, 0.5)))
    assert(out(("click", "error")) == ((1L, 2L, 0.5)))
    assert(out.size == 4)
  }

  test("gapFillLocf fills missing steps, carries value forward, flags observed") {
    val df = Seq(
      (1L, "2024-01-01 00:00:10", 5.0),
      (1L, "2024-01-01 02:00:10", 7.0), // buckets 00,02 observed; 01 missing
      (2L, "2024-01-01 05:30:00", 9.0)  // single bucket
    ).toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = TimeSeries.gapFillLocf(df, "user_id", "ts", 3600L,
        aggs = Seq(count(lit(1)).as("n"), sum(col("value")).as("v")),
        locfCols = Seq("v"))
      .orderBy("user_id", "bucket").collect()
    assert(out.length == 4)
    val gap = out(1) // user 1, 01:00 bucket
    assert(gap.getAs[java.sql.Timestamp]("bucket") == ts("2024-01-01 01:00:00"))
    assert(!gap.getAs[Boolean]("observed"))
    assert(gap.isNullAt(gap.fieldIndex("n")))
    assert(gap.getAs[Double]("v") == 5.0) // carried forward
    assert(out(2).getAs[Double]("v") == 7.0 && out(2).getAs[Boolean]("observed"))
    assert(out(3).getAs[Long]("user_id") == 2L &&
      out(3).getAs[java.sql.Timestamp]("bucket") == ts("2024-01-01 05:00:00"))
  }

  test("bucket alignment is exact long arithmetic at step boundaries") {
    // ts exactly on a boundary must land in its own bucket, not the
    // previous one (the double-division formulation could round here).
    val df = Seq((1L, "2024-01-01 06:00:00", 1.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = TimeSeries.gapFillLocf(df, "user_id", "ts", 21600L,
      aggs = Seq(count(lit(1)).as("n")), locfCols = Nil).collect()
    assert(out.length == 1)
    assert(out(0).getAs[java.sql.Timestamp]("bucket") == ts("2024-01-01 06:00:00"))
  }

  test("cusumChangepoint locates a planted mean shift; flat series tie to position 1") {
    import spark.implicits._
    def series(key: String, xs: Seq[Long]) = xs.zipWithIndex.map { case (x, i) =>
      (key, java.sql.Timestamp.valueOf(f"2026-01-01 00:${i}%02d:00"), i.toLong, x)
    }
    val df = (series("shift", Seq(0L, 0L, 0L, 0L, 10L, 10L, 10L, 10L)) ++
      series("flat", Seq(5L, 5L, 5L)) ++
      series("spike", Seq(0L, 100L, 0L, 0L)))
      .toDF("k", "ts", "tie", "x")
    val got = TimeSeries.cusumChangepoint(df, "k", "ts", "tie", col("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // S_k = n·P_k − k·T; shift: max |S| at the true break k=4 (|S|=160)
    assert(got("shift") == ((8L, 4L, 160L)))
    // flat: all S_k = 0 -> earliest position wins the tie
    assert(got("flat") == ((3L, 1L, 0L)))
    // spike at 2: S = [-100, 200, 100]... argmax k=2
    assert(got("spike") == ((4L, 2L, 200L)))
    // determinism under partitioning
    val re = TimeSeries.cusumChangepoint(df.repartition(7), "k", "ts", "tie", col("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(re == got)
  }

  test("periodicity: planted period-2 signal wins lag 2; flat ties to lag 1") {
    import spark.implicits._
    def series(key: String, xs: Seq[Long]) = xs.zipWithIndex.map { case (x, i) =>
      (key, java.sql.Timestamp.valueOf(f"2026-01-01 00:${i}%02d:00"), i.toLong, x)
    }
    val df = (series("p2", Seq(0L, 10L, 0L, 10L, 0L, 10L)) ++
      series("flat", Seq(4L, 4L, 4L, 4L, 4L)))
      .toDF("k", "ts", "tie", "x")
    val got = TimeSeries.periodicity(df, "k", "ts", "tie", col("x"), maxLag = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getBoolean(3))).toMap
    // hand-computed R: lag1 = -4500, lag2 = +3600, lag3 = -2700, lag4 = +1800
    assert(got("p2") == ((6L, 2, true)))
    // all-centered-zero: every R = 0 -> smallest lag, not positive
    assert(got("flat") == ((5L, 1, false)))
  }

  test("cohortRetention: first-bucket cohorts, offsets, distinct users per cell") {
    import spark.implicits._
    // u1 active days 0,1,8 (weekly buckets 0,0,1); u2 day 7 (bucket 1);
    // u3 days 0 and 14 (buckets 0,2)
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-09"),
      (2L, "2024-01-08"), (3L, "2024-01-01"), (3L, "2024-01-15"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val got = TimeSeries.cohortRetention(ev, "user_id", "ts", bucketDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = 19723 / 7 // epoch-day of 2024-01-01, floored to weeks
    assert(got == Map(
      (w0.toLong, 0L) -> 2L,      // u1+u3 in cohort w0 week 0
      (w0.toLong, 1L) -> 1L,      // u1 returns next week
      (w0.toLong, 2L) -> 1L,      // u3 returns two weeks later
      ((w0 + 1).toLong, 0L) -> 1L // u2's own cohort
    ))
    // null users dropped
    val withNull = ev.union(Seq((null.asInstanceOf[java.lang.Long], "2024-01-01"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts")))
    assert(TimeSeries.cohortRetention(withNull, "user_id", "ts", 7)
      .agg(sum("n_users")).head().getLong(0) == 5L)
  }

  test("linearAttribution: equal shares, remainder to the latest touch, credits conserve") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val rows = Seq(
      // user A: 3 touches then a conversion — 333333×2 + 333334
      (1L, 10L, ts(1000000L), "click"), (1L, 11L, ts(2000000L), "view"),
      (1L, 12L, ts(3000000L), "click"), (1L, 13L, ts(4000000L), "purchase"),
      // user B: touch exactly at window edge (included), one at conv ts (excluded)
      (2L, 20L, ts(0L), "click"), (2L, 21L, ts(5000000L), "view"),
      (2L, 22L, ts(5000000L), "purchase"),
      // user C: conversion with no touch in window -> nothing
      (3L, 30L, ts(9000000L), "purchase"),
      // user D's touches never credit A/B's conversions
      (4L, 40L, ts(3500000L), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    def run(parts: Int) = TimeSeries.linearAttribution(rows.repartition(parts),
        "user_id", "event_id", "ts", "event_type", "purchase",
        Seq("click", "view"), windowUs = 5000000L, bucketUs = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val got = run(1)
    assert(got == Map(
      (13L, 10L) -> ((3L, 333333L)), (13L, 11L) -> ((3L, 333333L)),
      (13L, 12L) -> ((3L, 333334L)), // latest touch absorbs the remainder
      (22L, 20L) -> ((1L, 1000000L))))
    // conservation: every conversion's credits sum to exactly 1e6
    got.groupBy(_._1._1).foreach { case (_, m) =>
      assert(m.values.map(_._2).sum == 1000000L)
    }
    assert(run(16) == got)
  }

  test("positionAttribution: 40/20/40 with remainder to the latest middle; degenerate k") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val rows = Seq(
      // user A: 5 touches -> first 400000, last 400000, middles split 200000
      // into 66666/66666/66668 (remainder 2 to the latest middle)
      (1L, 10L, ts(1000000L), "click"), (1L, 11L, ts(2000000L), "view"),
      (1L, 12L, ts(3000000L), "click"), (1L, 13L, ts(4000000L), "view"),
      (1L, 14L, ts(4500000L), "click"), (1L, 15L, ts(5000000L), "purchase"),
      // user B: k = 1 -> everything; user C: k = 2 -> 400000 / 600000
      (2L, 20L, ts(1000000L), "click"), (2L, 21L, ts(2000000L), "purchase"),
      (3L, 30L, ts(1000000L), "click"), (3L, 31L, ts(2000000L), "view"),
      (3L, 32L, ts(3000000L), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    def run(parts: Int) = TimeSeries.positionAttribution(rows.repartition(parts),
        "user_id", "event_id", "ts", "event_type", "purchase",
        Seq("click", "view"), windowUs = 5000000L, bucketUs = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(4), r.getLong(5)))).toMap
    val got = run(1)
    assert(got((15L, 10L)) == (("first", 400000L)))
    assert(got((15L, 14L)) == (("last", 400000L)))
    assert(got((15L, 11L)) == (("middle", 66666L)))
    assert(got((15L, 12L)) == (("middle", 66666L)))
    assert(got((15L, 13L)) == (("middle", 66668L))) // latest middle absorbs 2
    assert(got((21L, 20L)) == (("first", 1000000L))) // k = 1
    assert(got((32L, 30L)) == (("first", 400000L)) &&
      got((32L, 31L)) == (("last", 600000L))) // k = 2: middle pot to last
    got.groupBy(_._1._1).foreach { case (_, m) =>
      assert(m.values.map(_._2).sum == 1000000L)
    }
    assert(run(16) == got)
  }

  test("ewmaDrift: hand-traced weights, both flag directions, warm-up row") {
    // window=2 → weights: lag1 gets 3^0·4^1 = 4, lag2 gets 3^1·4^0 = 3
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:01", 8.0),   // no history: den 0, no flag
      (1L, 2L, "2024-01-01 00:00:02", 8.0),   // ewma = 8000 (one lag)
      (1L, 3L, "2024-01-01 00:00:03", 20.0),  // ewma 8000, 20000 > 2·8000 → drift
      (1L, 4L, "2024-01-01 00:00:04", 2.0),   // num 4·20000+3·8000 = 104000, den 7
                                              // ewma ⌊104000/7⌋ = 14857; 2·2000·7 < 104000 → drift
      (2L, 5L, "2024-01-01 00:00:01", 5.0),
      (2L, 6L, "2024-01-01 00:00:02", 9.0)    // 9000·4 = 36000 vs 2·20000: no flag
    ).toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    def run(parts: Int) = TimeSeries.ewmaDrift(df.repartition(parts),
        "user_id", "ts", "event_id", col("value"), window = 2)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getInt(5)))).toMap
    val got = run(1)
    assert(got(1L) == ((8000L, None, 0)))
    assert(got(2L) == ((8000L, Some(8000L), 0)))
    assert(got(3L) == ((20000L, Some(8000L), 1)))
    assert(got(4L) == ((2000L, Some(14857L), 1)))
    assert(got(5L) == ((5000L, None, 0)))
    assert(got(6L) == ((9000L, Some(5000L), 0)))
    assert(run(13) == got, "partition-independent")
  }
}
