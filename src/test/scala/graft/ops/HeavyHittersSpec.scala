package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpecBase {

  private def naive(df: org.apache.spark.sql.DataFrame, threshold: Int) = {
    val n = df.filter(col("v").isNotNull).count()
    df.filter(col("v").isNotNull).groupBy(col("v")).count()
      .filter(col("count") * threshold > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame, threshold: Int) =
    HeavyHitters.heavyHitters(df, col("v"), threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("heavy hitters == exact GROUP BY/HAVING on a skewed stream") {
    import spark.implicits._
    // zipf-ish: value i appears 1000/i times, plus 2000 singletons
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i")) ++
      (1 to 2000).map(i => s"rare$i")
    val df = rows.toDF("v")
    assert(run(df, 20) == naive(df, 20))
    assert(run(df, 200) == naive(df, 200))
  }

  test("output is partition-independent even though candidates are not") {
    import spark.implicits._
    val rows = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"w$i")) ++
      (1 to 500).map(i => s"rare$i")
    val df = rows.toDF("v")
    val expected = naive(df, 15)
    assert(run(df.repartition(1), 15) == expected)
    assert(run(df.repartition(32), 15) == expected)
    // adversarial: the heavy hitter's copies spread thinly and evenly
    assert(run(df.repartition(32, col("v") === col("v")), 15) == expected)
  }

  test("a heavy hitter diluted evenly across partitions is still found") {
    import spark.implicits._
    // 64 copies of HH spread over 32 partitions (2 per partition) among
    // heavy local noise; globally 64 > 320/6 is false — use threshold
    // where HH is heavy: n = 320, HH=64 > 320/6≈53 ✓
    val rows = Seq.fill(64)("HH") ++ (1 to 256).map(i => s"noise$i")
    val df = rows.toDF("v").repartition(32)
    val got = run(df, 6)
    assert(got == Map("HH" -> 64L))
  }

  test("nulls are ignored; empty and all-distinct inputs yield nothing") {
    import spark.implicits._
    val withNulls = (Seq.fill(10)(Some("x")) ++ Seq.fill(5)(Option.empty[String]) ++
      (1 to 20).map(i => Some(s"r$i"))).toDF("v")
    // n = 30 non-null; x=10 > 30/5 ✓
    assert(run(withNulls, 5) == Map("x" -> 10L))
    assert(run(Seq.empty[String].toDF("v"), 5) == Map.empty)
    assert(run((1 to 100).map(i => s"u$i").toDF("v"), 5) == Map.empty)
  }

  test("misraGries unit: completeness and bounded state") {
    val stream = Seq.fill(40)("a") ++ (1 to 60).map(i => s"x$i")
    // a has count 40 > 100/5 — must survive MG with 4 counters
    val cands = HeavyHitters.misraGries(stream.iterator, 5).toSet
    assert(cands.contains("a"))
    assert(cands.size <= 4)
    // all-distinct stream: at most threshold-1 survivors
    val distinctCands = HeavyHitters.misraGries((1 to 1000).map(_.toString).iterator, 10).toSet
    assert(distinctCands.size <= 9)
  }
}
