package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  test("maxWatermark returns latest value overall and per key") {
    val df = Seq(("s1", 10L), ("s1", 30L), ("s2", 20L)).toDF("store", "sync_ts")
    assert(Relational.maxWatermark(df, "sync_ts").head().getLong(0) == 30L)
    val per = Relational.maxWatermark(df, "sync_ts", Seq("store"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("s1" -> 30L, "s2" -> 20L))
  }

  test("countOverThreshold implements the everyone-exclusion HAVING") {
    val df = (1 to 100).map(i => ("big", i)).toDF("group_id", "m")
      .union(Seq(("small", 1)).toDF("group_id", "m"))
    val out = Relational.countOverThreshold(df, "group_id", 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("big" -> 100L))
  }

  test("exceptIds = set difference; unionDistinct tolerates ragged columns") {
    val all = Seq("a", "b", "c", "d").toDF("id")
    val excl = Seq("b", "d", "zz").toDF("id")
    val diff = Relational.exceptIds(all, excl, "id").as[String].collect().toSet
    assert(diff == Set("a", "c"))

    val x = Seq(("a", 1)).toDF("id", "extra")
    val y = Seq("a", "b").toDF("id")
    val u = Relational.unionDistinct(x, y)
    assert(u.columns.toSet == Set("id", "extra"))
    assert(u.count() == 3) // (a,1), (a,null), (b,null)
  }

  test("nonEmpty guard") {
    assert(Relational.nonEmpty(Seq(1).toDF("x")))
    assert(!Relational.nonEmpty(Seq.empty[Int].toDF("x")))
  }

  test("saltedJoin produces exactly the plain join's result on skewed data") {
    // one hot key (1000 rows) + tail
    val big = ((1 to 1000).map(_ => ("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("a", "A"), ("z", "Z")).toDF("k", "tag")
    val expected = big.join(small, Seq("k")).groupBy("k", "tag")
      .count().collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Relational.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == expected)
    // and the hot key's rows actually spread across salts — asserted on
    // the IMPLEMENTATION's salt column, on fully identical hot rows
    // spanning multiple input partitions (the production shape: a hot
    // key big enough to matter spans many splits; the partition-id
    // component is what spreads identical replicas)
    val bigMulti = big.repartition(8)
    val spread = bigMulti.withColumn("__salt", Relational.bigSideSalt(bigMulti, 8))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(spread > 1)
  }
}
