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
}
