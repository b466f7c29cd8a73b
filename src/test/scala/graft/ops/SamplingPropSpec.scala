package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the sampling invariants the training-mix layer
  * depends on: two-phase quota == single-window reference under
  * arbitrary group skew / salt counts, and hash-sample nesting for any
  * rate pair. Generators driven directly (scalatest/scalacheck bridge
  * not in the dependency set). */
class SamplingPropSpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => g.apply(params, Seed(i.toLong)))
  }

  // skewed group assignment: group g with weight ~ 1/(g+1)
  private val caseGen = for {
    nRows <- Gen.choose(1, 400)
    nGroups <- Gen.choose(1, 6)
    k <- Gen.choose(1, 12)
    salts <- Gen.oneOf(1, 2, 7, 64)
    groupOf <- Gen.listOfN(nRows, Gen.frequency(
      (8, Gen.const(0)), (4, Gen.const(1)), (2, Gen.const(2)),
      (1, Gen.choose(3, 5))))
  } yield (groupOf.map(g => g % nGroups), k, salts)

  test("quotaPerGroup == single-window reference under arbitrary skew and salt count") {
    val cases = samples(caseGen, 20)
    assert(cases.size >= 12)
    cases.foreach { case (groups, k, salts) =>
      val rows = groups.zipWithIndex.map { case (g, i) => (s"g$g", i.toLong) }
        .toDF("grp", "id")
      val got = Sampling.quotaPerGroup(rows, "grp", "id", k, salts)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(md5(col("id").cast("string")), col("id"))
      val ref = rows.withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
        .select(col("grp"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == ref, s"k=$k salts=$salts groups=${groups.take(20)}…")
      assert(got.groupBy(_._1).values.forall(_.size <= k))
    }
  }

  test("weightedSystematicSample == exact BigInt single-pass reference") {
    val wsGen = for {
      nRows <- Gen.choose(1, 250)
      n <- Gen.choose(1L, 60L)
      weights <- Gen.listOfN(nRows, Gen.choose(1L, 1000L))
    } yield (weights, n)
    val cases = samples(wsGen, 15)
    assert(cases.size >= 10)
    cases.foreach { case (weights, n) =>
      val rows = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "wt")
      val got = Sampling.weightedSystematicSample(rows, "id", "wt", n)
        .select("id", "copies").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: exact BigInt fold over the md5-sorted weight line
      def md5Hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val sorted = weights.zipWithIndex
        .map { case (w, i) => (md5Hex(i.toString), i.toLong, w) }
        .sortBy(t => (t._1, t._2))
      val bigW = BigInt(weights.sum)
      def pts(c: BigInt): BigInt = (BigInt(2 * n) * c + bigW) / (2 * bigW)
      var cum = BigInt(0)
      val ref = sorted.flatMap { case (_, id, w) =>
        cum += w
        val c = pts(cum) - pts(cum - w)
        if (c >= 1) Some(id -> c.toLong) else None
      }.toMap
      assert(got == ref, s"n=$n rows=${weights.size}")
      assert(got.values.sum == n)
    }
  }

  test("hashSample(p1) ⊆ hashSample(p2) for any p1 <= p2") {
    val pctPairs = samples(for {
      a <- Gen.choose(0, 100); b <- Gen.choose(0, 100)
    } yield (math.min(a, b), math.max(a, b)), 15)
    val ids = (1L to 500L).toDF("id")
    pctPairs.foreach { case (p1, p2) =>
      val s1 = Sampling.hashSample(ids, "id", p1).collect().map(_.getLong(0)).toSet
      val s2 = Sampling.hashSample(ids, "id", p2).collect().map(_.getLong(0)).toSet
      assert(s1.subsetOf(s2), s"p1=$p1 p2=$p2")
    }
  }
}
