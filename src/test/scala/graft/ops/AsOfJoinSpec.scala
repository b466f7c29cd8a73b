package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right at or before each left, per key") {
    val trades = Seq(
      ("A", ts("2026-01-01 10:00:05"), 1L),
      ("A", ts("2026-01-01 10:00:10"), 2L),
      ("A", ts("2026-01-01 09:59:00"), 3L), // before any quote -> null
      ("B", ts("2026-01-01 10:00:07"), 4L)
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", ts("2026-01-01 10:00:00"), 100L, 1.0),
      ("A", ts("2026-01-01 10:00:05"), 101L, 2.0), // equal ts: visible
      ("A", ts("2026-01-01 10:00:09"), 102L, 3.0),
      ("B", ts("2026-01-01 10:00:01"), 103L, 4.0),
      ("C", ts("2026-01-01 10:00:00"), 104L, 5.0)  // unmatched key
    ).toDF("sym", "ts", "quote_id", "px")

    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "ts", "ts", "quote_id", Seq("quote_id", "px"))
      .select($"trade_id", $"__match".getField("quote_id").as("qid"), $"__match".getField("px").as("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

    assert(out(1L).contains((101L, 2.0))) // equal-ts quote wins over 10:00:00
    assert(out(2L).contains((102L, 3.0)))
    assert(out(3L).isEmpty)               // no quote at or before
    assert(out(4L).contains((103L, 4.0)))
  }

  test("ties among right rows at the same timestamp resolve to max tiebreak") {
    val left = Seq(("K", ts("2026-01-01 00:00:10"), 1L)).toDF("k", "ts", "lid")
    val right = Seq(
      ("K", ts("2026-01-01 00:00:10"), 7L, "first"),
      ("K", ts("2026-01-01 00:00:10"), 9L, "second")).toDF("k", "ts", "rid", "tag")
    val m = AsOfJoin.asofBackward(left, right, Seq("k"), "ts", "ts", "rid", Seq("rid", "tag"))
      .select($"__match".getField("rid")).head().getLong(0)
    assert(m == 9L)
  }
}
