package graft.ops

import graft.SparkSpecBase
import graft.core.Tables

class BucketingSpec extends SparkSpecBase {

  test("bucketed join runs without a shuffle exchange") {
    // clean slate: in-memory catalog forgets tables across JVMs but the
    // warehouse directory persists
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val ord = Tables.orders(spark, sf0001).limit(500)
    val li = Tables.lineitem(spark, sf0001).limit(2000)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(ord, "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(li, "b_lineitem", Seq("o_orderkey"), 8)

    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() > 0)

    // sanity: same result as the shuffle join on raw frames
    val expected = ord.join(li, Seq("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
