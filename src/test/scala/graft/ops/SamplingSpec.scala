package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("hashBucket is stable, in-range, and independent of partitioning") {
    val ids = (1L to 1000L).toDF("id")
    val once = ids.select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once.values.forall(b => b >= 0 && b < 100))
    // same assignment after an arbitrary repartition (pure per-row map)
    val again = ids.repartition(7).select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == again)
  }

  test("splitLabel respects cut points and covers every row") {
    val df = (1L to 2000L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("split"))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts.values.sum == 2000L)
    // md5 buckets are uniform: train share within a loose band of 80%
    assert(counts("train") > 1400 && counts("train") < 1800, counts)
    // label agrees with the bucket it is defined over
    val mismatch = (1L to 2000L).toDF("id")
      .select(Sampling.hashBucket(col("id"), 100).as("b"),
        Sampling.splitLabel(col("id"), 80, 10).as("split"))
      .filter(!(col("b") < 80 && col("split") === "train"
        || col("b") >= 80 && col("b") < 90 && col("split") === "valid"
        || col("b") >= 90 && col("split") === "test"))
    assert(mismatch.isEmpty)
  }

  test("hashSample keeps exactly the sub-pct buckets, so samples nest") {
    val ids = (1L to 1000L).toDF("id")
    val s10 = Sampling.hashSample(ids, "id", 10).collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(ids, "id", 20).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20), "10% sample must be contained in the 20% sample")
    assert(s10.nonEmpty && s20.size > s10.size)
  }
}
