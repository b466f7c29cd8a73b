package graft.ops

import graft.SparkSpecBase

class EntityMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private val master = Seq((1L, "acme corp"), (2L, "zenith ltd"), (3L, "acme corp"))
    .toDF("mid", "name")

  test("links within maxDist and picks the smallest-id master on ties") {
    val feed = Seq((10L, "acme crop"), (11L, "zenith ltd"), (12L, "totally other thing"))
      .toDF("fid", "name")
    val got = EntityMatch.linkRecords(feed, "fid", "name", master, "mid", "name")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // transposed 'crop' is 2 edits from both acme masters -> id 1 wins
    assert(got == Map(10L -> ((1L, 2)), 11L -> ((2L, 0))))
    assert(!got.contains(12L), "nothing within 2 edits must stay unmatched")
  }

  test("suffix blocking pass recovers a corruption at the name's front") {
    // first char deleted: prefix block misses, suffix block must catch
    val feed = Seq((20L, "cme corp")).toDF("fid", "name")
    val got = EntityMatch.linkRecords(feed, "fid", "name", master, "mid", "name")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got == Map(20L -> ((1L, 1))))
  }

  test("short names fall back to single-char blocks: interior deletion still found") {
    // "abcde" -> "abde": both 3-char keys shift, the short-name
    // single-char passes must recover the pair
    val m = Seq((1L, "abcde")).toDF("mid", "name")
    val feed = Seq((30L, "abde")).toDF("fid", "name")
    val got = EntityMatch.linkRecords(feed, "fid", "name", m, "mid", "name")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got == Map(30L -> ((1L, 1))))
  }

  test("maxBlockRows drops hot blocks; recall falls back to the other passes") {
    // ten masters share the prefix block "aaa"; suffixes differ, so
    // with the prefix block capped the suffix pass still links
    val hot = (1L to 10L).map(i => (i, s"aaa name$i")).toDF("mid", "name")
    val feed = Seq((50L, "aaa name7x")).toDF("fid", "name")
    val capped = EntityMatch.linkRecords(feed, "fid", "name", hot, "mid", "name",
        maxDist = 2, blockChars = 3, maxBlockRows = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.isEmpty, "suffix 'e7x' matches no master — capped prefix block gone")
    // front-corrupted record shares master 7's suffix block
    val feed3 = Seq((52L, "aa name7")).toDF("fid", "name")
    val viaSuffix = EntityMatch.linkRecords(feed3, "fid", "name", hot, "mid", "name",
        maxDist = 2, blockChars = 3, maxBlockRows = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSuffix == Set((52L, 7L)), "suffix pass links despite the capped prefix block")
  }

  test("colliding output column names are refused") {
    intercept[IllegalArgumentException] {
      EntityMatch.linkRecords(master, "mid", "name", master, "mid", "name")
    }
  }

  test("deterministic under partitioning; null names drop") {
    val feed = Seq((Some(10L), Some("acme crop")), (Some(13L), None))
      .map { case (a, b) => (a.get, b.orNull) }.toDF("fid", "name")
    val a = EntityMatch.linkRecords(feed, "fid", "name", master, "mid", "name")
      .collect().toSeq
    val b = EntityMatch.linkRecords(feed.repartition(5), "fid", "name",
      master.repartition(3), "mid", "name").collect().toSeq
    assert(a == b && a.map(_.getLong(0)).toSet == Set(10L))
  }
}
