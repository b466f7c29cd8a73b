package graft.ops

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property check: the union+running-last as-of composition must agree
  * with the obvious per-row brute force (max right ts <= left ts per
  * key, tiebreak max id) on arbitrary small inputs — the invariant a
  * custom AsOfJoinExec would be tested against. Generators driven
  * directly (scalatest/scalacheck bridge not in the dependency set). */
class AsOfJoinPropSpec extends SparkSpecBase {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.oneOf("k1", "k2", "k3")
    t <- Gen.choose(0L, 50L) // small range forces ts collisions
    id <- Gen.choose(0L, 1000L)
  } yield (k, t, id)

  private def samples(seed: Long, n: Int): Seq[(String, Long, Long)] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => rowGen.apply(params, Seed(seed * 1000 + i)))
  }

  private def bruteForce(left: Seq[(String, Long, Long)],
                         right: Seq[(String, Long, Long)]): Map[(String, Long, Long), Option[Long]] =
    left.map { case (k, t, id) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= t)
      val best = candidates.sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      (k, t, id) -> best
    }.toMap

  test("asofBackward == brute force on random inputs (ties, dup ts, missing keys)") {
    for (round <- 1 to 12) {
      val l = samples(round, 12).zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) } // unique left ids
      val r0 = samples(round + 500, 12)

      val left = l.map { case (k, t, id) => (k, new Timestamp(t * 1000), id) }
        .toDF("key", "ts", "left_id")
      val right = r0.map { case (k, t, id) => (k, new Timestamp(t * 1000), id, id * 10.0) }
        .toDF("key", "ts", "right_id", "payload")

      val out = AsOfJoin.asofBackward(left, right, Seq("key"), "ts", "ts",
        "right_id", Seq("right_id"))
        .select($"left_id", $"__match".getField("right_id").as("rid"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      val expected = bruteForce(l, r0)
      l.foreach { case (k, t, id) =>
        assert(out(id) == expected((k, t, id)),
          s"round $round row ($k,$t,$id): got ${out(id)}, want ${expected((k, t, id))}")
      }
    }
  }
}
