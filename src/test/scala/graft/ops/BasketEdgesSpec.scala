package graft.ops

import graft.SparkSpecBase

class BasketEdgesSpec extends SparkSpecBase {
  import spark.implicits._

  // basket 1: {10, 11, 12}; basket 2: {10, 11}; basket 3: {99}
  private def baskets = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), // dup line: same item twice
    (2L, 10L), (2L, 11L),
    (3L, 99L)
  ).toDF("basket", "item")

  test("uncapped edges are all intra-basket ordered pairs, both directions, distinct") {
    val got = BasketEdges.edges(baskets, "basket", "item")
      .as[(Long, Long)].collect().toSet
    val expected = Set(
      (10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L), (11L, 12L), (12L, 11L))
    assert(got == expected) // singleton basket 3 emits nothing; dup line collapses
  }

  test("cap bounds per-basket pair volume, selects deterministically, and is a subset") {
    val hot = (1 to 50).map(i => (7L, i.toLong)).toDF("basket", "item")
    val uncapped = BasketEdges.edges(hot, "basket", "item")
    assert(uncapped.count() == 50L * 49)

    val capped = BasketEdges.edges(hot, "basket", "item", maxBasketSize = 5)
    val pairs = capped.as[(Long, Long)].collect().toSet
    assert(pairs.size == 5 * 4) // exactly cap·(cap-1), not k·(k-1)
    // subset of the uncapped edge set
    assert(pairs.subsetOf(uncapped.as[(Long, Long)].collect().toSet))
    // deterministic: a second run picks the identical items
    val again = BasketEdges.edges(hot, "basket", "item", maxBasketSize = 5)
      .as[(Long, Long)].collect().toSet
    assert(again == pairs)
  }

  test("a cap at or above every basket size is result-identical to no cap") {
    val uncapped = BasketEdges.edges(baskets, "basket", "item")
      .as[(Long, Long)].collect().toSet
    val capped = BasketEdges.edges(baskets, "basket", "item", maxBasketSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }
}
