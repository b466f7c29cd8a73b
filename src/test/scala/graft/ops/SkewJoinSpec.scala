package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // Skewed left: key 1 has 100 rows, keys 2-5 one each.
  private lazy val left = ((1 to 100).map(i => (1L, i.toLong)) ++
    (2 to 5).map(k => (k.toLong, 1000L + k))).toDF("k", "rid")
  private lazy val right = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (6L, "unmatched"))
    .toDF("k", "tag")

  test("salted join result is row-identical to the plain join") {
    val plain = left.join(right, Seq("k"))
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), Seq("rid"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key's rows actually spread across multiple salt buckets") {
    val saltExpr = pmod(crc32(concat_ws("", col("k").cast("string"),
      col("rid").cast("string"))), lit(8L)).cast("int")
    val buckets = left.filter(col("k") === 1L).select(saltExpr.as("s"))
      .distinct().count()
    assert(buckets >= 4, s"expected the 100 hot rows in >=4 of 8 buckets, got $buckets")
  }

  test("salt columns do not leak into the output") {
    val out = SkewJoin.saltedJoin(left, right, Seq("k"), Seq("rid"), 4)
    assert(out.columns.toSet == Set("k", "rid", "tag"))
  }
}
