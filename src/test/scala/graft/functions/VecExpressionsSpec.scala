package graft.functions

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("native vec_dot matches the HOF fold bit-for-bit on real embeddings") {
    VecExpressions.register(spark)
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val pairs = emb.select($"vec_id".as("a_id"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("b_id"), $"embedding".as("b")))
      .filter($"a_id" < $"b_id").limit(500)
    val diff = pairs.select(
      VecExpressions.vecDot($"a", $"b").as("native"),
      VectorFunctions.dot($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.count() == 0)
  }

  test("vec_dot stays inside whole-stage codegen") {
    VecExpressions.register(spark)
    val emb = Tables.embeddings(spark, sf0001).limit(10)
    val plan = emb.select(VecExpressions.vecDot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage containing the
    // projection with vec_dot
    assert(plan.contains("*(1) Project [vec_dot"), plan)
  }

  test("mixed float/double element types (corpus vs centroid model)") {
    VecExpressions.register(spark)
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("f", "d")
    val out = df.select(
      VecExpressions.vecDot($"f", $"d").as("fd"),
      VecExpressions.vecDot($"d", $"f").as("df"),
      VecExpressions.vecDot($"d", $"d").as("dd")).head()
    assert(out.getDouble(0) == 1.0)
    assert(out.getDouble(1) == 1.0)
    assert(out.getDouble(2) == 0.3125)
  }

  test("null and ragged inputs") {
    VecExpressions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f, 2.0f, 9.0f)), Some(Array(1.0f, 1.0f)))).toDF("a", "b")
    val out = df.select(VecExpressions.vecDot($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).contains(11.0))
    assert(out(1).isEmpty)       // null input -> null
    assert(out(2).contains(3.0)) // ragged: min-length loop
  }
}
