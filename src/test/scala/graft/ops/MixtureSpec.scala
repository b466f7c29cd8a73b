package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class MixtureSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus(sizes: (String, Int)*) =
    sizes.flatMap { case (s, n) => (1 to n).map(i => (s"$s-$i", s)) }
      .toDF("doc_id", "source")

  test("largest-remainder apportionment: exact hand-computed quotas") {
    // sizes 1/4/9 -> sqrt weights 1/2/3 (e6); budget 10:
    // bases 1/3/5, one leftover seat -> largest remainder (source a)
    val got = Mixture.temperatureQuotas(corpus("a" -> 1, "b" -> 4, "c" -> 9), "source", 10L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "a" -> ((1L, 1000000L, 2L)),
      "b" -> ((4L, 2000000L, 3L)),
      "c" -> ((9L, 3000000L, 5L))))
  }

  test("quotas always sum exactly to the budget") {
    for (budget <- Seq(0L, 1L, 7L, 997L)) {
      val q = Mixture.temperatureQuotas(
          corpus("w" -> 3, "x" -> 17, "y" -> 250, "z" -> 2), "source", budget)
        .agg(sum("quota")).head().getLong(0)
      assert(q == budget, s"budget $budget")
    }
  }

  test("temperature upweights small sources vs proportional sampling") {
    val got = Mixture.temperatureQuotas(corpus("tiny" -> 4, "huge" -> 400), "source", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // proportional share of tiny would be ~1; sqrt share is 2/22 ≈ 9
    assert(got("tiny") > 100L * 4 / 404)
    assert(got("tiny") + got("huge") == 100L)
  }

  test("null groups drop; result independent of partitioning") {
    val df = corpus("a" -> 5, "b" -> 5)
      .union(Seq(("n-1", null.asInstanceOf[String])).toDF("doc_id", "source"))
    val one = Mixture.temperatureQuotas(df, "source", 9L).orderBy("source").collect().toSeq
    val two = Mixture.temperatureQuotas(df.repartition(7), "source", 9L)
      .orderBy("source").collect().toSeq
    assert(one == two && one.map(_.getString(0)).toSet == Set("a", "b"))
  }

  // ---- Neyman allocation ---------------------------------------------------

  private def ney(rows: Seq[(String, Long)], budget: Long) =
    Mixture.neymanQuotas(rows.toDF("g", "v"), "g", "v", budget)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("var_q"), r.getAs[Long]("s_q"), r.getAs[Long]("w"),
          r.getAs[Long]("quota")))).toMap

  test("neyman: the whole budget goes to the only varied stratum") {
    // A: {0,10} => var (2*100-100)/4 = 25, s 5, w 10; B constant => w 0
    val got = ney(Seq("A" -> 0L, "A" -> 10L, "B" -> 3L, "B" -> 3L,
      "B" -> 3L, "B" -> 3L), 10L)
    assert(got("A") == ((25L, 5L, 10L, 10L)))
    assert(got("B") == ((0L, 0L, 0L, 0L)))
  }

  test("neyman: all-constant strata degrade to proportional allocation") {
    val got = ney(Seq("A" -> 5L, "A" -> 5L, "B" -> 9L, "B" -> 9L,
      "B" -> 9L, "B" -> 9L, "B" -> 9L, "B" -> 9L), 8L)
    assert(got("A")._4 == 2L && got("B")._4 == 6L)
    assert(got.values.forall(_._2 == 0L))
  }

  test("neyman quotas sum exactly to the budget under remainders") {
    val rows = Seq("A" -> 1L, "A" -> 8L, "B" -> 2L, "B" -> 9L, "B" -> 4L,
      "C" -> 100L, "C" -> 1L, "C" -> 50L)
    for (budget <- Seq(0L, 1L, 7L, 101L)) {
      val got = ney(rows, budget)
      assert(got.values.map(_._4).sum == budget, s"budget $budget")
    }
  }

  test("neyman: null groups/values drop; partition-independent") {
    val rows = Seq(("A", Some(1L)), ("A", Some(9L)), ("A", None),
      (null, Some(5L)), ("B", Some(2L)), ("B", Some(4L)))
    val df = rows.toDF("g", "v")
    val one = Mixture.neymanQuotas(df, "g", "v", 13L).orderBy("g").collect().toSeq
    val two = Mixture.neymanQuotas(df.repartition(5), "g", "v", 13L)
      .orderBy("g").collect().toSeq
    assert(one == two)
    assert(one.map(_.getString(0)) == Seq("A", "B"))
    assert(one.head.getAs[Long]("n_docs") == 2L) // the null value dropped
  }
}
