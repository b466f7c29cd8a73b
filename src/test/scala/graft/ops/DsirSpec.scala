package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  test("featureBucket is stable, in-range, portable-hash-based") {
    val toks = Seq("alpha", "beta", "alpha").toDF("tok")
      .select(Dsir.featureBucket(col("tok"), 64).as("b")).collect().map(_.getLong(0))
    assert(toks.forall(b => b >= 0 && b < 64))
    assert(toks(0) == toks(2), "same token, same bucket")
  }

  test("bucketWeights: add-one-smoothed ratio, buckets keyed by raw corpus") {
    // buckets wide enough that the three tokens never collide
    val raw = Seq((1L, "aa aa bb"), (2L, "cc")).toDF("id", "text")
    val target = Seq((10L, "aa")).toDF("id", "text")
    val w = Dsir.bucketWeights(raw, target, "id", "text", buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val bucket = (t: String) => Seq(t).toDF("tok")
      .select(Dsir.featureBucket(col("tok"), 1 << 20)).head().getLong(0)
    // aa: raw 2, tgt 1 -> (1e6*2) div 3; bb/cc: raw 1, tgt 0 -> 1e6 div 2
    assert(w(bucket("aa")) == ((2L, 1L, 666666L)))
    assert(w(bucket("bb")) == ((1L, 0L, 500000L)))
    assert(w(bucket("cc")) == ((1L, 0L, 500000L)))
  }

  test("scoreDocs sums count-weighted quanta; empty docs drop") {
    val raw = Seq((1L, "aa aa bb"), (2L, "cc"), (3L, " ")).toDF("id", "text")
    val target = Seq((10L, "aa")).toDF("id", "text")
    val got = Dsir.scoreDocs(raw, target, "id", "text", buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((3L, 2L * 666666L + 500000L, (2L * 666666L + 500000L) / 3L)),
      2L -> ((1L, 500000L, 500000L))))
  }

  test("a target-heavy token outweighs a target-absent one") {
    val raw = (1L to 50L).map(i => (i, "common niche")).toDF("id", "text")
    val target = (1L to 40L).map(i => (i + 100L, "common")).toDF("id", "text")
    val w = Dsir.bucketWeights(raw, target, "id", "text", 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val bucket = (t: String) => Seq(t).toDF("tok")
      .select(Dsir.featureBucket(col("tok"), 1 << 20)).head().getLong(0)
    assert(w(bucket("common")) > w(bucket("niche")))
  }

  test("scores are independent of input partitioning") {
    val raw = (1L to 300L).map(i => (i, s"t${i % 11} t${i % 7} t${i % 13}")).toDF("id", "text")
    val target = (1L to 60L).map(i => (i + 1000L, s"t${i % 7}")).toDF("id", "text")
    val a = Dsir.scoreDocs(raw, target, "id", "text").orderBy("id").collect().toSeq
    val b = Dsir.scoreDocs(raw.repartition(9), target.repartition(5), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
