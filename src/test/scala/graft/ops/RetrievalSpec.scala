package graft.ops

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  test("quantizedDotScores: 1e-3 floor quantization then exact long dot") {
    val emb = Seq(
      (1L, Seq(1.5f, -0.25f)),
      (2L, Seq(0.0f, 2.0f)),
      (3L, Seq(-1.0009f, 0.001f)) // floor(-1000.9) = -1001, floor(1.0) = 1
    ).toDF("vec_id", "embedding")
    val out = Retrieval.quantizedDotScores(emb, "vec_id", "embedding", Seq(2L, 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1500L * 2 + -250L * 3)
    assert(out(2L) == 0L * 2 + 2000L * 3)
    assert(out(3L) == -1001L * 2 + 1L * 3)
  }

  test("rankTop: descending score, id tiebreak, top-n cut, no global sort") {
    val scored = Seq((5L, 10L), (1L, 30L), (2L, 30L), (3L, 20L), (4L, 5L))
      .toDF("id", "score")
    val ranked = Retrieval.rankTop(scored, "id", "score", n = 3)
    val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L)) // tie 30/30 -> id order
    // the cut is a TakeOrderedAndProject, not a global Sort+Limit
    val p = ranked.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("rrfFuse: integral-division contributions, null rank for missed lists") {
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val sem = Seq((10L, 2L), (30L, 1L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Long])))
    // 10: both lists -> 1000000/61 + 1000000/62 (integer division)
    assert(out.head == ((10L, 1000000L / 61 + 1000000L / 62, Some(1L), Some(2L))))
    // 30: sem rank 1 only; 20: lex rank 2 only — 16393 > 16129
    assert(out(1) == ((30L, 1000000L / 61, None, Some(1L))))
    assert(out(2) == ((20L, 1000000L / 62, Some(2L), None)))
  }

  test("hybridSearch end-to-end: deterministic, both rank columns populated somewhere") {
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.table(spark, sf0001, "embeddings")
    val q = (0 until 64).map(i => (((i * 37 + 11) % 100) - 50).toLong)
    def run() = Retrieval.hybridSearch(docs, "doc_id", "text", emb, "vec_id", "embedding",
      Seq("the", "and", "data"), q, n = 20, kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run(); val b = run()
    assert(a == b, "fusion must be bit-deterministic across runs")
    assert(a.size == 10)
    // rrf strictly ordered descending with id tiebreak -> no dup ids
    assert(a.map(_._1).distinct.size == 10)
    assert(a.sliding(2).forall { case Seq(x, y) => x._2 >= y._2; case _ => true })
  }

  test("mmrSelect: a near-duplicate of the top pick loses to a diverse candidate") {
    import spark.implicits._
    // a=(1,0), b≈a (near-dup), c orthogonal; query along x
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.0f)), (3L, Seq(0.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    // weak query (100,0): b's redundancy with a (999·1000) dwarfs its
    // relevance (999·100), so at λ=1/2 the orthogonal c must win step 2
    val got = Retrieval.mmrSelect(emb, "vec_id", "embedding",
        queryQ = Seq(100L, 0L), poolN = 3, k = 3, lambdaNum = 1, lambdaDen = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(x => (x._1, x._2)).toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
    val byId = got.map(x => x._2 -> x).toMap
    assert(byId(1L)._3 == 100000L && byId(1L)._4 == 0L) // rel=1000·100, maxsim 0
    assert(byId(3L)._4 == 0L)                           // c ⟂ a
    assert(byId(2L)._4 == 999000L)                      // b·a = 999·1000
  }

  test("evaluateRanking: hand-computed hits/precision/recall/MRR") {
    import spark.implicits._
    // ranks 1..6; relevant = {rank2, rank5, plus an unranked doc}
    val ranked = (1L to 6L).map(i => (i * 10, i)).toDF("id", "rank")
    val rel = Seq(20L, 50L, 999L).toDF("id")
    val got = Retrieval.evaluateRanking(ranked, rel, Seq(2, 5))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // @2: 1 hit -> p=500000, recall=1/3=333333; first rel rank=2 -> rr=500000
    assert(got(2) == ((1L, 500000L, 333333L, 500000L, 3L)))
    // @5: 2 hits -> p=400000, recall=666666
    assert(got(5) == ((2L, 400000L, 666666L, 500000L, 3L)))
  }

  test("evaluateRanking: empty qrels and no hits degrade to zeros, not errors") {
    import spark.implicits._
    val ranked = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val none = Retrieval.evaluateRanking(ranked, Seq.empty[Long].toDF("id"), Seq(2)).head()
    assert((none.getLong(1), none.getLong(2), none.getLong(3), none.getLong(4)) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("mmrSelect: k caps at pool size; lambda=1 degenerates to pure relevance order") {
    import spark.implicits._
    val emb = (1L to 6L).map(i => (i, Seq((10.0f - i) / 10f, i / 10f)))
      .toDF("vec_id", "embedding")
    val pure = Retrieval.mmrSelect(emb, "vec_id", "embedding",
        Seq(1000L, 0L), poolN = 4, k = 10, lambdaNum = 1, lambdaDen = 1)
      .collect().map(r => r.getLong(1)).toSeq
    // only 4 candidates in the pool; λ=1 ignores redundancy entirely
    assert(pure == Seq(1L, 2L, 3L, 4L))
  }
}
