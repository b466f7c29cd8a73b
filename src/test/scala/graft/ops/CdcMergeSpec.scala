package graft.ops

import graft.SparkSpecBase

class CdcMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    .toDF("id", "name", "v")

  test("mergeApply upserts, deletes, and passes untouched keys through") {
    val changes = Seq(
      (2L, "U", "b2", 21), // update
      (3L, "D", null.asInstanceOf[String], 0), // delete
      (4L, "U", "d", 40) // insert
    ).toDF("id", "op", "name", "v")
    val got = CdcMerge.mergeApply(base, changes, "id")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 10), (2L, "b2", 21), (4L, "d", 40)))
  }

  test("anti join is not force-broadcast — plan degrades by size, not by hint") {
    val changes = Seq((1L, "U", "a2", 11)).toDF("id", "op", "name", "v")
    val plan = CdcMerge.mergeApply(base, changes, "id")
      .queryExecution.optimizedPlan.toString
    // a ResolvedHint surviving to the optimized plan would force
    // broadcast regardless of batch size (the r7 driver-OOM hazard)
    assert(!plan.contains("ResolvedHint"), s"forced broadcast hint in plan:\n$plan")
  }
}
