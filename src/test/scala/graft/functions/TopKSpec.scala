package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def windowTopK(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }

  private def aggTopK(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy(col("query_id"))
      .agg(TopKAgg.topk(k)(col("cosine_sim"), col("neighbor_id")).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__e")))
      .select(col("query_id"), (col("__p") + 1).cast("int").as("rank"),
        col("__e._2").as("neighbor_id"), col("__e._1").as("cosine_sim"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("aggregate top-k == window top-k, ties to smallest id, any partitioning") {
    // deterministic pseudo-random scores with planted exact ties
    val scored = (1L to 5L).flatMap { q =>
      (1L to 200L).map { n =>
        val s = ((q * 7919 + n * 104729) % 97) / 97.0 // many exact ties per query
        (q, n, s)
      }
    }.toDF("query_id", "neighbor_id", "cosine_sim")
    for (parts <- Seq(1, 13); k <- Seq(1, 10, 250)) {
      val a = asSet(aggTopK(scored.repartition(parts), k))
      val w = asSet(windowTopK(scored, k))
      assert(a == w, s"parts=$parts k=$k")
    }
  }

  test("fewer candidates than k: every candidate ranked, in order") {
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("query_id", "neighbor_id", "cosine_sim")
    val got = aggTopK(scored, 5).collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 11L), (2, 10L)))
  }

  test("-0.0 ties +0.0 (Spark comparison parity) and breaks to the smaller id") {
    val scored = Seq((1L, 20L, 0.0), (1L, 10L, -0.0), (1L, 30L, -1.0))
      .toDF("query_id", "neighbor_id", "cosine_sim")
    assert(asSet(aggTopK(scored, 2)) == asSet(windowTopK(scored, 2)))
    val first = aggTopK(scored, 2).filter(col("rank") === 1).head()
    assert(first.getLong(2) == 10L, "zero-tie must break to the smaller id")
  }

  test("NaN sorts largest (Spark sort parity); null score/id skipped") {
    val scored = Seq((1L, Some(10L), Some(0.9)), (1L, Some(11L), Some(Double.NaN)),
      (1L, Some(12L), None), (1L, None, Some(0.95)))
      .toDF("query_id", "neighbor_id", "cosine_sim")
    val got = aggTopK(scored, 2).collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 11L), (2, 10L)))
  }

  test("property: aggregate == plain-Scala sorted reference over random scores/ties/partitionings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    val scoreGen = Gen.frequency(
      (6, Gen.choose(-100, 100).map(_ / 7.0)), // dense → planted ties
      (1, Gen.const(0.0)), (1, Gen.const(-0.0)),
      (1, Gen.const(Double.NaN)), (1, Gen.const(Double.MaxValue)))
    val caseGen = for {
      n <- Gen.choose(1, 300)
      k <- Gen.oneOf(1, 3, 17, 400)
      parts <- Gen.oneOf(1, 5, 23)
      scores <- Gen.listOfN(n, scoreGen)
    } yield (scores, k, parts)
    val cases = (1 to 15).flatMap(i => caseGen.apply(params, Seed(i.toLong)))
    assert(cases.size >= 10)
    cases.foreach { case (scores, k, parts) =>
      val rows = scores.zipWithIndex.map { case (s, i) => (1L + i % 3, i.toLong, s) }
      // plain-Scala reference: Spark double order = NaN largest, -0.0 == 0.0;
      // canon() also maps NaN to a sentinel so set equality can see it
      def norm(s: Double) = if (s == 0.0) 0.0 else s
      def canon(s: Double) = if (s.isNaN) Double.MinValue else norm(s)
      val ref = rows.groupBy(_._1).view.mapValues(_
        .map { case (_, id, s) => (norm(s), id) }
        .sortWith((a, b) => {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c > 0 else a._2 < b._2
        }).take(k).zipWithIndex
        .map { case ((s, id), p) => (p + 1, id, canon(s)) }.toSet).toMap
      val got = aggTopK(rows.toDF("query_id", "neighbor_id", "cosine_sim").repartition(parts), k)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getInt(1), r.getLong(2), canon(r.getDouble(3)))).toSet).toMap
      assert(got == ref, s"k=$k parts=$parts n=${scores.size}")
    }
  }

  // ---- payload variant (TopKPayloadAgg): ranking identical, payload along ----

  private def aggTopKP(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy(col("query_id"))
      .agg(TopKAgg.topkWithPayload(k)(col("cosine_sim"), col("neighbor_id"),
        col("payload")).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__e")))
      .select(col("query_id"), (col("__p") + 1).cast("int").as("rank"),
        col("__e._2").as("neighbor_id"), col("__e._3").as("payload"),
        col("__e._1").as("cosine_sim"))

  test("payload aggregate == window top-k on (score, id) AND carries the right payload") {
    val scored = (1L to 4L).flatMap { q =>
      (1L to 150L).map { n =>
        val s = ((q * 7919 + n * 104729) % 53) / 53.0 // planted exact ties
        (q, n, n * 31 + 7, s) // payload is a pure function of the id
      }
    }.toDF("query_id", "neighbor_id", "payload", "cosine_sim")
    for (parts <- Seq(1, 13); k <- Seq(1, 10, 200)) {
      val got = aggTopKP(scored.repartition(parts), k).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
      val want = windowTopK(scored.select(col("query_id"), col("neighbor_id"), col("cosine_sim")), k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(2) * 31 + 7,
          r.getDouble(3))).toSet
      assert(got == want, s"parts=$parts k=$k")
    }
  }

  test("payload variant: NaN largest, -0.0 ties +0.0 to smaller id, null payload skipped") {
    val scored = Seq(
      (1L, Some(20L), Some(100L), Some(0.0)),
      (1L, Some(10L), Some(200L), Some(-0.0)),
      (1L, Some(11L), Some(300L), Some(Double.NaN)),
      (1L, Some(12L), None, Some(0.99)), // null payload: contributes nothing
      (1L, Some(13L), Some(400L), None), // null score: contributes nothing
      (1L, None, Some(500L), Some(0.98))) // null id: contributes nothing
      .toDF("query_id", "neighbor_id", "payload", "cosine_sim")
    val got = aggTopKP(scored, 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, 11L, 300L), (2, 10L, 200L), (3, 20L, 100L)))
  }

  test("hardNegatives rides the payload aggregate and matches its window form") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val got = VectorFunctions.hardNegatives(queries, emb, "vec_id", "embedding", "label", k = 4)
    assert(!got.queryExecution.optimizedPlan.toString.contains("row_number"),
      "integral-label path must not plan a rank window")
    // reference: the window form over the same label-inequality join
    val q = queries.select(col("vec_id").as("query_id"), col("label").as("__ql"),
      col("embedding").as("__qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
      col("embedding").as("__cv"))
    val scored = c.join(broadcast(q), col("__ql") =!= col("neighbor_label"))
      .withColumn("cosine_sim", VectorFunctions.cosineNative(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    val want = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("neighbor_label"),
        col("cosine_sim"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4))).toSet
    assert(rows(got) == rows(want))
    // a hard negative is by construction never the query's own label
    val labels = queries.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.collect().foreach(r => assert(labels(r.getLong(0)) != r.getInt(3)))
  }

  test("bruteForceTopK rides the aggregate and matches the window form on real vectors") {
    val emb = graft.core.Tables.table(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val got = VectorFunctions.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 4)
    // no rank window in the optimized plan (the aggregate replaced it)
    assert(!got.queryExecution.optimizedPlan.toString.contains("row_number"),
      "long-id path must not plan a rank window")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", VectorFunctions.cosineNative(col("__qv"), col("__cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"))
    assert(asSet(got) == asSet(windowTopK(scored, 4)))
  }
}
