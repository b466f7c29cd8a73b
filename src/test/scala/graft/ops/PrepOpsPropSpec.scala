package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-10 prep/maintenance invariants:
  * distributed global rank == the single-window reference on arbitrary
  * data, temperature quotas always apportion the budget exactly, and
  * incremental aggregate maintenance == from-scratch recompute under
  * arbitrary insert/delete deltas. Generators driven directly
  * (scalatest/scalacheck bridge not in the dependency set). */
class PrepOpsPropSpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => g.apply(params, Seed(i.toLong)))
  }

  test("globalRank == single-window row_number for arbitrary value multisets") {
    import org.apache.spark.sql.expressions.Window
    val caseGen = for {
      n <- Gen.choose(1, 300)
      vs <- Gen.listOfN(n, Gen.choose(-50L, 50L)) // heavy ties
    } yield vs
    samples(caseGen, 12).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val expected = rows.withColumn("rk",
          row_number().over(Window.orderBy(col("v").asc, col("id").desc)).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val got = Sampling.globalRank(rows.repartition(5),
          Seq(col("v").asc, col("id").desc), out = "rk")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"n=${vs.size}")
    }
  }

  test("temperatureQuotas: Σ quota == budget for arbitrary sizes and budgets") {
    val caseGen = for {
      nGroups <- Gen.choose(1, 12)
      sizes <- Gen.listOfN(nGroups, Gen.choose(1, 2000))
      budget <- Gen.choose(0L, 5000L)
    } yield (sizes, budget)
    samples(caseGen, 15).foreach { case (sizes, budget) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (1 to n).map(i => (s"g$g-$i", s"g$g"))
      }.toDF("id", "src")
      val quotas = Mixture.temperatureQuotas(rows, "src", budget)
        .collect().map(r => r.getLong(3))
      assert(quotas.sum == budget, s"sizes=$sizes budget=$budget")
      assert(quotas.forall(_ >= 0))
    }
  }

  test("mergeDelta == from-scratch recompute for arbitrary consistent deltas") {
    val caseGen = for {
      nBase <- Gen.choose(0, 60)
      base <- Gen.listOfN(nBase, for {
        g <- Gen.choose(0, 4); v <- Gen.choose(-100L, 100L)
      } yield (g, v))
      nIns <- Gen.choose(0, 30)
      ins <- Gen.listOfN(nIns, for {
        g <- Gen.choose(0, 6); v <- Gen.choose(-100L, 100L)
      } yield (g, v))
      // deletes: a subset of base rows (consistent CDC by construction)
      delMask <- Gen.listOfN(nBase, Gen.prob(0.3))
    } yield (base, ins, base.zip(delMask).collect { case (r, true) => r })
    samples(caseGen, 15).foreach { case (base, ins, dels) =>
      val baseDf = base.map { case (g, v) => (s"g$g", v) }.toDF("g", "v")
      val delta = (ins.map { case (g, v) => (s"g$g", v, "I") } ++
        dels.map { case (g, v) => (s"g$g", v, "D") }).toDF("g", "v", "op")
      val incremental = IncrementalAgg.mergeDelta(
          IncrementalAgg.aggState(baseDf, Seq("g"), "v"),
          delta, Seq("g"), "v", "op")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val finalRows = base.diff(dels) ++ ins
      val recompute =
        if (finalRows.isEmpty) Map.empty[String, (Long, Long)]
        else IncrementalAgg.aggState(
            finalRows.map { case (g, v) => (s"g$g", v) }.toDF("g", "v"), Seq("g"), "v")
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(incremental == recompute,
        s"base=${base.size} ins=${ins.size} dels=${dels.size}")
    }
  }
}
