package graft.ops

import graft.SparkSpecBase
import java.nio.file.Files

class TableSwapSpec extends SparkSpecBase {
  import spark.implicits._

  test("stageAndSwap publishes atomically-by-rename and refuses empty overwrite") {
    val root = Files.createTempDirectory("graft-swap").toString
    val v1 = Seq(1, 2, 3).toDF("x")
    assert(TableSwap.stageAndSwap(spark, v1, root, "t"))
    assert(spark.read.parquet(s"$root/t").count() == 3)

    // publish v2 over v1
    val v2 = Seq(4, 5).toDF("x")
    assert(TableSwap.stageAndSwap(spark, v2, root, "t"))
    assert(spark.read.parquet(s"$root/t").count() == 2)

    // empty input must NOT clobber the existing table (okta guard)
    val empty = Seq.empty[Int].toDF("x")
    assert(!TableSwap.stageAndSwap(spark, empty, root, "t"))
    assert(spark.read.parquet(s"$root/t").count() == 2)
  }

  test("writeBatch truncate-then-append protocol") {
    val path = Files.createTempDirectory("graft-batch").toString + "/t"
    TableSwap.writeBatch(Seq(1).toDF("x"), path, firstBatch = true)
    TableSwap.writeBatch(Seq(2, 3).toDF("x"), path, firstBatch = false)
    assert(spark.read.parquet(path).count() == 3)
    TableSwap.writeBatch(Seq(9).toDF("x"), path, firstBatch = true)
    assert(spark.read.parquet(path).count() == 1)
  }
}
