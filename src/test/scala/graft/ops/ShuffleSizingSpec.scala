package graft.ops

import graft.SparkSpecBase

class ShuffleSizingSpec extends SparkSpecBase {

  test("targetPartitions: ceil at the measured rows-per-partition, clamped") {
    import ShuffleSizing._
    assert(targetPartitions(0L) == 1)
    assert(targetPartitions(RowsPerPartition) == 1)
    assert(targetPartitions(RowsPerPartition + 1) == 2)
    // the r13 sf10 shape: ~90M edges -> 60 partitions (the manual fix
    // was 64; anything in the no-spill band works)
    assert(targetPartitions(90000000L) == 60)
    assert(targetPartitions(Long.MaxValue / 2) == MaxPartitions)
  }

  test("withEdgeScaledShuffle raises during the body, restores after; session is a floor") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // small graph: session value is a floor, body sees it unchanged
    ShuffleSizing.withEdgeScaledShuffle(spark, 10L) {
      assert(spark.conf.get(key) == before)
    }
    // big graph: raised inside, restored outside (even on throw)
    ShuffleSizing.withEdgeScaledShuffle(spark, 100L * ShuffleSizing.RowsPerPartition) {
      assert(spark.conf.get(key).toInt == 100)
    }
    assert(spark.conf.get(key) == before)
    intercept[RuntimeException] {
      ShuffleSizing.withEdgeScaledShuffle(spark, 100L * ShuffleSizing.RowsPerPartition) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) == before)
  }
}
