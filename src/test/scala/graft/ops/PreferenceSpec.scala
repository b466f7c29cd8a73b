package graft.ops

import graft.SparkSpecBase

class PreferenceSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(games: Seq[(String, String)], iters: Int = 3): Map[String, (Long, Long, Long)] =
    Preference.bradleyTerry(games.toDF("w", "l"), "w", "l", iterations = iters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Driver-side BigInt replica of the exact MM arithmetic (floor
    * divisions, per-round renormalization) — the SamplingPropSpec
    * discipline: the distributed op must match this bit-for-bit. */
  private def reference(games: Seq[(String, String)], iters: Int,
                        scale: Long = 1000000L): Map[String, BigInt] = {
    val clean = games.filter { case (w, l) => w != null && l != null && w != l }
    val items = clean.flatMap { case (w, l) => Seq(w, l) }.distinct.sorted
    val n = clean.groupBy { case (w, l) => if (w < l) (w, l) else (l, w) }
      .map { case (k, v) => k -> BigInt(v.size) }
    val wins = clean.groupBy(_._1).map { case (k, v) => k -> BigInt(v.size) }
    val big = BigInt(scale) * BigInt(scale)
    var pi = items.map(_ -> BigInt(scale)).toMap
    for (_ <- 1 to iters) {
      val raw = items.map { i =>
        val d = items.flatMap { j =>
          val key = if (i < j) (i, j) else (j, i)
          n.get(key).map(nij => (nij * big) / (pi(i) + pi(j)))
        }.sum
        i -> (wins.getOrElse(i, BigInt(0)) * big) / d
      }.toMap
      val tot = raw.values.sum
      // winner floor: π ≥ 1 quantum for any item with wins > 0 (the
      // zero-denominator guard in the distributed op)
      pi = raw.map { case (i, v) =>
        val floorQ = if (wins.getOrElse(i, BigInt(0)) > 0) BigInt(1) else BigInt(0)
        i -> ((v * items.size * scale) / tot).max(floorQ)
      }
    }
    pi
  }

  test("uniform round-robin stays at exactly scale for every item") {
    val games = Seq("A" -> "B", "B" -> "A", "B" -> "C", "C" -> "B", "A" -> "C", "C" -> "A")
    val got = run(games)
    assert(got.keySet == Set("A", "B", "C"))
    got.foreach { case (_, (rating, wins, ng)) =>
      assert(rating == 1000000L); assert(wins == 2L); assert(ng == 4L)
    }
  }

  test("dominance ordering is preserved; an all-loss item rates 0") {
    val got = run(Seq("A" -> "B", "A" -> "C", "B" -> "C"))
    assert(got("A")._1 > got("B")._1)
    assert(got("B")._1 > got("C")._1)
    assert(got("C")._1 == 0L)      // wins = 0 => boundary MLE direction
    assert(got("C")._2 == 0L && got("C")._3 == 2L)
  }

  test("matches the BigInt reference bit-for-bit on an uneven schedule") {
    val games = Seq(
      "A" -> "B", "A" -> "B", "B" -> "A", "A" -> "C", "C" -> "A",
      "B" -> "C", "B" -> "C", "B" -> "C", "C" -> "D", "D" -> "B",
      "A" -> "D", "D" -> "C", "C" -> "B")
    for (iters <- Seq(1, 3, 5)) {
      val got = run(games, iters).map { case (k, (r, _, _)) => k -> BigInt(r) }
      assert(got == reference(games, iters), s"iters=$iters")
    }
  }

  test("partition independence and rerun determinism") {
    val games = Seq(
      "A" -> "B", "A" -> "B", "B" -> "A", "A" -> "C", "C" -> "A",
      "B" -> "C", "B" -> "C", "B" -> "C", "C" -> "D", "D" -> "B")
    val base = run(games)
    val repart = Preference.bradleyTerry(games.toDF("w", "l").repartition(7), "w", "l", 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(base == repart)
    assert(base == run(games))
  }

  test("extreme skew: a low-share winner floors at 1 quantum, not 0 (no NULL poisoning)") {
    // A beats B 10⁶ times, B beats C once: without the winner floor,
    // B's rating rounds to 0 by round 4 and the round-5 (B,C) pair
    // divides by zero (π_B + π_C = 0) → NULL ratings everywhere. With
    // the floor, B bottoms out at 1 quantum and C (all-loss) stays 0.
    val games = Seq.fill(1000000)("A" -> "B") :+ ("B" -> "C")
    val got = run(games, iters = 5)
    assert(got("B")._1 >= 1L, s"winner B must keep >= 1 quantum, got ${got("B")._1}")
    assert(got("C")._1 == 0L)
    assert(got("A")._1 > got("B")._1)
    val ref = reference(games, 5)
    assert(got.map { case (k, (r, _, _)) => k -> BigInt(r) } == ref)
  }

  test("null and self games are dropped") {
    val games = Seq(("A", "B"), ("A", "A"), (null, "B"), ("B", null), ("B", "A"))
    val got = run(games)
    assert(got.keySet == Set("A", "B"))
    assert(got("A")._3 == 2L && got("B")._3 == 2L) // only the 2 real games
  }
}
