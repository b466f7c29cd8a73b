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

  // ---- multi-field Fellegi–Sunter -------------------------------------------

  private val F = EntityMatch.LinkField
  private val fsFields = Seq(
    F("name", "m_name", 2000L, -1500L, maxDist = 2),
    F("city", "m_city", 1500L, -1200L, maxDist = 1),
    F("seg", "m_seg", 400L, -300L, maxDist = 0, block = false))
  private val fsMaster = Seq(
    (1L, "acme corporation", "springfield", "retail"),
    (2L, "acme corporatian", "shelbyville", "retail"), // near-dup name, other city
    (3L, "zenith logistics", "springfield", "bulk"))
    .toDF("mid", "m_name", "m_city", "m_seg")

  test("FS weight sum separates a match from a co-blocked stranger") {
    // name corrupted (1 deletion), city exact, segment WRONG: the
    // weighted sum 2000+1500−300=3200 must beat master 2 (name still
    // within lev 2, city/seg disagree: 2000−1200−300=500) and master 3
    // (name disagree, city+seg agree: −1500+1500+400=400) — a
    // single-field name argmin could not separate 1 from 2 (lev 1 vs
    // 2, both within threshold); the weighted sum is what disambiguates
    val feed = Seq((10L, "acme corporaton", "springfield", "bulk"))
      .toDF("fid", "name", "city", "seg")
    val out = EntityMatch.linkRecordsMulti(feed, "fid", fsMaster, "mid",
        fsFields, minScoreMilli = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 1L, 3200L)))
  }

  test("FS: a null field contributes zero, neither agree nor disagree") {
    val feed = Seq((11L, "acme corporation", null: String, "retail"))
      .toDF("fid", "name", "city", "seg")
    val out = EntityMatch.linkRecordsMulti(feed, "fid", fsMaster, "mid",
        fsFields, minScoreMilli = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 2000 (name) + 0 (null city) + 400 (seg) = 2400, master 1 by
    // (score desc, mid asc) over the equal-scoring master 2? no —
    // master 2's name is 1 edit away too (agree), city null → 0,
    // seg agree → same 2400; the id tie-break must pick 1
    assert(out.toSeq == Seq((11L, 1L, 2400L)))
  }

  test("FS: sub-threshold best candidate is a non-match, absent from output") {
    val feed = Seq((12L, "acme corporation", "shelbyville", "bulk"))
      .toDF("fid", "name", "city", "seg")
    // best candidate is master 2 at 2000+1500−300 = 3200; a 3500 bar
    // rejects it — sub-threshold best candidates are non-matches
    val out = EntityMatch.linkRecordsMulti(feed, "fid", fsMaster, "mid",
      fsFields, minScoreMilli = 3500L)
    assert(out.collect().isEmpty)
  }

  test("FS: a capped hot block on one field falls back to the other field's passes") {
    // every master shares the name prefix AND suffix (hot blocks of 6
    // > cap 3); the city field's blocks are small and carry the link
    val m = (1L to 6L).map(i => (i, s"acme division $i", s"city$i", "x"))
      .toDF("mid", "m_name", "m_city", "m_seg")
    val feed = Seq((20L, "acme division 4x", "city4", "x"))
      .toDF("fid", "name", "city", "seg")
    val out = EntityMatch.linkRecordsMulti(feed, "fid", m, "mid", Seq(
        F("name", "m_name", 2000L, -1500L, maxDist = 2),
        F("city", "m_city", 1500L, -1200L, maxDist = 0),
        F("seg", "m_seg", 400L, -300L, maxDist = 0, block = false)),
        minScoreMilli = 1000L, maxBlockRows = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((20L, 4L, 3900L)))
  }

  test("FS: short field values (< 2·blockChars) block by first/last char") {
    // 'abcde' → 'abde' (one interior deletion): prefix-3 'abd'≠'abc'
    // AND suffix-3 'bde'≠'cde' both shift, so without the short legs
    // the true match would never be a candidate — the linkRecords
    // short-name contract, now mirrored field-by-field
    val m = Seq((1L, "abcde", "x"), (2L, "zzzzz", "x")).toDF("mid", "m_name", "m_seg")
    val feed = Seq((30L, "abde", "x")).toDF("fid", "name", "seg")
    val out = EntityMatch.linkRecordsMulti(feed, "fid", m, "mid", Seq(
        F("name", "m_name", 2000L, -1500L, maxDist = 2),
        F("seg", "m_seg", 400L, -300L, maxDist = 0, block = false)),
        minScoreMilli = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((30L, 1L, 2400L)))
  }

  test("FS is deterministic under partitioning") {
    val feed = Seq((10L, "acme corporaton", "springfield", "bulk"),
      (11L, "zenith logistics", "springfeld", "bulk"))
      .toDF("fid", "name", "city", "seg")
    val a = EntityMatch.linkRecordsMulti(feed, "fid", fsMaster, "mid",
      fsFields, 1000L).collect().toSeq
    val b = EntityMatch.linkRecordsMulti(feed.repartition(7), "fid",
      fsMaster.repartition(3), "mid", fsFields, 1000L).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("goldenRecord: each field survives independently as latest non-null") {
    import spark.implicits._
    val rows = Seq(
      // key, order, tie, name, phone
      ("e1", 1L, 1L, Some("ann"), Option.empty[String]),
      ("e1", 2L, 2L, Option.empty[String], Some("111")),
      ("e1", 3L, 3L, Some("anne"), Option.empty[String]), // latest name
      ("e2", 5L, 4L, Option.empty[String], Option.empty[String]),
      ("e3", 1L, 5L, Some("bob"), Some("222")),
      ("e3", 1L, 6L, Some("rob"), Option.empty[String]) // same order → tie decides
    ).toDF("k", "ord", "id", "name", "phone")
    val got = EntityMatch.goldenRecord(rows.repartition(5), "k", "ord", "id",
        Seq("name", "phone"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    // e1 mixes source rows: name from ord 3, phone from ord 2
    assert(got("e1") == ((3L, Some("anne"), Some("111"))))
    // all-null field stays null
    assert(got("e2") == ((1L, None, None)))
    // equal order falls to the tie column (id 6 > 5)
    assert(got("e3") == ((2L, Some("rob"), Some("222"))))
  }
}
