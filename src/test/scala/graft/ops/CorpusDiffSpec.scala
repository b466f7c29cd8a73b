package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CorpusDiffSpec extends SparkSpecBase {
  import spark.implicits._

  private def prev = Seq(
    (1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2")
  ).toDF("doc_id", "text", "source")

  private def cur = Seq(
    (2L, "beta", "s1"),      // unchanged
    (3L, "gamma prime", "s3"), // changed, and moved source s2 -> s3
    (4L, "delta", "s2")      // added
  ).toDF("doc_id", "text", "source")

  test("diff classifies added/removed/changed/unchanged by fingerprint") {
    val out = CorpusDiff.diff(prev, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("drift drops unchanged rows") {
    val out = CorpusDiff.drift(prev, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("summaryBy counts per (status, dim) with cur's dims winning for docs in both") {
    val out = CorpusDiff.summaryBy(prev, cur, "doc_id", "text", Seq("source"))
      .collect().map(r => (r.getAs[String]("status"), r.getAs[String]("source")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(out == Map(
      ("removed", "s1") -> 1L,   // doc 1: prev source (only snapshot that has it)
      ("unchanged", "s1") -> 1L,
      ("changed", "s3") -> 1L,   // doc 3: cur's NEW source, not s2
      ("added", "s2") -> 1L))
  }
}
