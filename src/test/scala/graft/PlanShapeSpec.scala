package graft

/** Physical-plan shape assertions for the corpus-management queries'
  * scale properties — the claims PLANS.md documents, pinned so a
  * refactor can't silently regress them into shuffle-heavy plans. */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.executedPlan.toString

  test("mixture sample is a pure narrow filter — no hash shuffle") {
    val p = plan("q59_mixture_sample")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("split assignment shuffles only the 3-group aggregate") {
    val p = plan("q54_hash_split")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p.take(2000))
  }

  test("decontamination broadcasts the gram set — corpus never sort-merge-joined") {
    val p = plan("q55_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("incremental dedup is an anti-join against the fingerprint index") {
    val p = plan("q56_incremental_dedup")
    assert(p.contains("LeftAnti"), p.take(2000))
  }
}
