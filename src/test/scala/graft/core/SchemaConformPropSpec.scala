package graft.core

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the conformance invariants the okta pipeline
  * depends on (SURVEY.md §5 recommendation). Generators driven
  * directly (scalatest/scalacheck bridge not in the dependency set). */
class SchemaConformPropSpec extends SparkSpecBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => g.apply(params, Seed(i.toLong)))
  }

  private val typeGen = Gen.oneOf[DataType](StringType, LongType, DoubleType, BooleanType)
  private val schemaGen: Gen[StructType] = for {
    names <- Gen.someOf(Seq("a", "b", "c", "d", "e", "f")).suchThat(_.nonEmpty)
    types <- Gen.listOfN(names.size, typeGen)
  } yield StructType(names.zip(types).map { case (n, t) => StructField(n, t) }.toSeq)

  private val inputColsGen =
    Gen.someOf(Seq("a", "b", "c", "d", "e", "f", "x", "y")).suchThat(_.nonEmpty)

  test("conformToSchema always yields exactly the target schema, for any input column set") {
    val cases = samples(schemaGen, 25).zip(samples(inputColsGen, 25))
    assert(cases.size >= 15)
    cases.foreach { case (schema, inputCols) =>
      val inSchema = StructType(inputCols.map(n => StructField(n, StringType)).toSeq)
      val rows = java.util.List.of(Row.fromSeq(inputCols.map(_ => "1").toSeq))
      val df = spark.createDataFrame(rows, inSchema)
      val out = SchemaConform.conformToSchema(df, schema)
      assert(out.schema.fields.map(_.name).toSeq == schema.fields.map(_.name).toSeq)
      assert(out.schema.fields.map(_.dataType).toSeq == schema.fields.map(_.dataType).toSeq)
      val r = out.head()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!inputCols.contains(f.name)) assert(r.isNullAt(i), s"col ${f.name} should be null")
      }
    }
  }

  test("keep-latest dedup: exactly one row per key, carrying the max order value") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(1, 5)
      v <- Gen.choose(1L, 100L)
    } yield (s"k$k", v))
    samples(rowsGen, 20).foreach { rows =>
      val df = rows.toDF("id", "ver")
      val out = graft.ops.Relational.keepLatest(df, Seq("id"), Seq(col("ver").desc))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(out == expect)
    }
  }

  test("EAV last-match equals reverse-scan-first-match for any meta array") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val kvGen = Gen.listOf(for {
      k <- Gen.oneOf("event_code", "origin", "other")
      v <- Gen.choose(0, 99).map(_.toString)
    } yield (k, v))
    samples(kvGen, 30).foreach { kvs =>
      val df = Seq(Tuple1(kvs)).toDF("meta_raw")
        .select(expr("transform(meta_raw, x -> named_struct('key', x._1, 'value', x._2))").as("meta"))
      val got = df.select(graft.ops.NestedFlatten.eavLast($"meta", "event_code", lit("DEF")).as("v"))
        .head().getString(0)
      val expect = kvs.reverse.collectFirst { case ("event_code", v) => v }.getOrElse("DEF")
      assert(got == expect, s"kvs=$kvs")
    }
  }
}
