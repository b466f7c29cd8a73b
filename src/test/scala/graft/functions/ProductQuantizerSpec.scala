package graft.functions

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpecBase {

  private def mkDf(vecs: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  /** Pure-Scala replica of the documented training contract. */
  private def replicaTrain(vecs: Seq[(Long, Array[Float])], m: Int, subDim: Int,
                           k: Int, iters: Int): IndexedSeq[IndexedSeq[(Int, IndexedSeq[Long])]] = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def q(x: Float): Long = math.floor(x.toDouble * 1e6).toLong
    val sub = vecs.map { case (id, v) =>
      id -> IndexedSeq.tabulate(m)(s => IndexedSeq.tabulate(subDim)(i => q(v(s * subDim + i))))
    }
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(k)
    var model = IndexedSeq.tabulate(m) { s =>
      seeds.zipWithIndex.map { case ((_, v), j) =>
        j -> IndexedSeq.tabulate(subDim)(i => q(v(s * subDim + i)))
      }.toIndexedSeq
    }
    def l2(a: IndexedSeq[Long], b: IndexedSeq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (_ <- 1 to iters) {
      val assigned = sub.map { case (id, sv) =>
        (id, (0 until m).map(s => model(s).map { case (c, cv) => (l2(sv(s), cv), c) }.min._2))
      }
      model = IndexedSeq.tabulate(m) { s =>
        assigned.groupBy(_._2(s)).toSeq.sortBy(_._1).map { case (c, members) =>
          val cv = IndexedSeq.tabulate(subDim) { i =>
            val xs = members.map { case (id, _) => sub.find(_._1 == id).get._2(s)(i) }
            val total = xs.map(BigInt(_)).sum
            // floor division for either sign
            val fl = (total - total.mod(BigInt(xs.size))) / xs.size
            fl.toLong
          }
          c -> cv
        }.toIndexedSeq
      }
    }
    model
  }

  private val fixture: Seq[(Long, Array[Float])] = (1L to 50L).map { id =>
    id -> Array.tabulate(8) { i =>
      (((id * 31 + i * 17) % 23).toFloat / 7f - 1.5f)
    }
  }

  test("training matches the pure-Scala replica bit-for-bit, any partitioning") {
    val expect = replicaTrain(fixture, m = 2, subDim = 4, k = 4, iters = 2)
    val got = ProductQuantizer.train(mkDf(fixture).repartition(13),
      "vec_id", "embedding", m = 2, subDim = 4, k = 4, iters = 2)
    assert(got.codebooks == expect)
    val again = ProductQuantizer.train(mkDf(fixture).repartition(1),
      "vec_id", "embedding", m = 2, subDim = 4, k = 4, iters = 2)
    assert(again.codebooks == expect)
  }

  test("encode assigns each subvector to its (distance, code)-argmin centroid") {
    val model = ProductQuantizer.train(mkDf(fixture), "vec_id", "embedding", 2, 4, 4, 2)
    val codes = ProductQuantizer.encode(mkDf(fixture), "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    def q(x: Float) = math.floor(x.toDouble * 1e6).toLong
    fixture.foreach { case (id, v) =>
      (0 until 2).foreach { s =>
        val sv = IndexedSeq.tabulate(4)(i => q(v(s * 4 + i)))
        val best = model.codebooks(s).map { case (c, cv) =>
          (cv.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }.min._2
        assert(codes((id, s)) == best, s"id=$id s=$s")
      }
    }
  }

  test("ADC: an exact duplicate is rank-1 at the query's own-code residual") {
    val dup = fixture :+ (999L -> fixture.head._2.clone)
    val df = mkDf(dup)
    val model = ProductQuantizer.train(df, "vec_id", "embedding", 2, 4, 4, 2)
    val codes = ProductQuantizer.encode(df, "vec_id", "embedding", model)
    val queries = mkDf(Seq(dup.last))
    val top = ProductQuantizer.adcTopK(queries, codes, model, "vec_id", "embedding", 3)
      .orderBy(col("rank")).collect()
    // ADC measures query→CENTROID distance: a same-code neighbor (the
    // duplicate, id 1 — lowest id wins the tie) sits at the query's own
    // quantization residual Σ_s min_c L2²(q_s, c), never below it
    def q(x: Float) = math.floor(x.toDouble * 1e6).toLong
    val residual = (0 until 2).map { s =>
      val sv = IndexedSeq.tabulate(4)(i => q(dup.last._2(s * 4 + i)))
      model.codebooks(s).map { case (_, cv) =>
        cv.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.min
    }.sum
    assert(top.head.getLong(2) == 1L && top.head.getLong(3) == residual)
    assert(top.forall(_.getLong(3) >= residual))
  }

  test("ADC search preserves cluster structure where it exists") {
    // deterministic well-separated clusters (the driver's embeddings
    // fixture has label-independent geometry — exact L2 itself scores
    // chance there, so PQ quality must be pinned on data WITH signal):
    // 4 centers at ±3 per block, noise ≤ 0.4 — top-5 by ADC must stay
    // in-cluster (exact L2 does; chance is ~1/4)
    val clustered = (0L until 200L).map { id =>
      val c = (id % 4).toInt
      id -> Array.tabulate(16) { i =>
        val center = if ((i / 4) % 4 == c) 3f else -3f
        center + (((id * 31 + i * 17) % 9).toFloat - 4f) / 10f
      }
    }
    val df = mkDf(clustered).localCheckpoint()
    val model = ProductQuantizer.train(df, "vec_id", "embedding",
      m = 4, subDim = 4, k = 8, iters = 2)
    val codes = ProductQuantizer.encode(df, "vec_id", "embedding", model)
    val queries = mkDf(clustered.take(8))
    val adc = ProductQuantizer.adcTopK(queries, codes, model, "vec_id", "embedding", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(adc.length == 40)
    val inCluster = adc.count { case (q, n) => q % 4 == n % 4 }
    assert(inCluster == 40, s"$inCluster/40 ADC neighbors in-cluster")
  }

  /** Clustered corpus + label column for the IVFADC composition tests:
    * the coarse quantizer is the per-label integer-sum centroid. */
  private def clusteredWithLabels = {
    import spark.implicits._
    val rows = (0L until 200L).map { id =>
      val c = (id % 4).toInt
      (id, Array.tabulate(16) { i =>
        val center = if ((i / 4) % 4 == c) 3f else -3f
        center + (((id * 31 + i * 17) % 9).toFloat - 4f) / 10f
      }, c)
    }
    rows.toDF("vec_id", "embedding", "label").localCheckpoint()
  }

  test("IVFADC with nprobe = C degenerates to exactly the exhaustive ADC") {
    val df = clusteredWithLabels
    val model = ProductQuantizer.train(df, "vec_id", "embedding",
      m = 4, subDim = 4, k = 8, iters = 2)
    val codes = ProductQuantizer.encode(df, "vec_id", "embedding", model)
    val centroids = VectorFunctions.centroidsByLabel(df, "label", "embedding")
    val queries = df.orderBy(col("vec_id")).limit(6)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("query_id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val exhaustive = rows(ProductQuantizer.adcTopK(
      queries, codes, model, "vec_id", "embedding", 5))
    // nprobe = 4 (every cell) AND an over-probe both equal the full scan
    for (np <- Seq(4, 9)) {
      val got = rows(ProductQuantizer.ivfAdcTopK(
        df.orderBy(col("vec_id")).limit(6), df, centroids, model,
        "vec_id", "embedding", k = 5, nprobe = np))
      assert(got == exhaustive, s"nprobe=$np must equal exhaustive ADC")
    }
  }

  test("IVFADC with nprobe = 1 searches only the query's own cell") {
    val df = clusteredWithLabels
    val model = ProductQuantizer.train(df, "vec_id", "embedding",
      m = 4, subDim = 4, k = 8, iters = 2)
    val queries = df.orderBy(col("vec_id")).limit(8)
    val centroids = VectorFunctions.centroidsByLabel(df, "label", "embedding")
    val got = ProductQuantizer.ivfAdcTopK(queries, df, centroids, model,
        "vec_id", "embedding", k = 5, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(got.length == 40)
    // well-separated clusters: cell == label cluster, so every
    // candidate (hence every neighbor) shares the query's cluster
    assert(got.forall { case (q, n) => q % 4 == n % 4 })
  }

  // ---- residual IVFADC (Jégou §IV) ----------------------------------------

  test("centroidMeansE6 equals the BigInt floor replica, negatives included") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(-0.75f, 0.3f), 0), (2L, Array(0.5f, -0.9f), 0),
      (3L, Array(-0.1f, 0.2f), 0), (4L, Array(1.5f, 1.5f), 1),
      (5L, Array(-2.5f, 0.25f), 1))
    val df = rows.toDF("vec_id", "embedding", "label").repartition(3)
    val got = VectorFunctions.centroidMeansE6(df, "label", "embedding")
    def floorDiv(a: BigInt, b: BigInt) = (a - ((a % b + b) % b)) / b
    val want = rows.groupBy(_._3).map { case (lab, rs) =>
      lab -> IndexedSeq.tabulate(2) { i =>
        val m0 = rs.map(r => BigInt(math.floor(r._2(i).toDouble * 1073741824.0).toLong)).sum
        floorDiv(m0 * 1000000, BigInt(rs.size) * BigInt(1L << 30)).toLong
      }
    }.toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("residualE6 kernel: interpreted equals codegen; unknown bucket and short vec null") {
    import spark.implicits._
    val means = Seq(0 -> Seq(100L, -200L), 2 -> Seq(50L, 50L))
    val df = Seq(
      (1L, Array(0.5f, 0.25f), 0), (2L, Array(-1.0f, 0.0f), 2),
      (3L, Array(0.1f, 0.1f), 7),          // unknown bucket
      (4L, null.asInstanceOf[Array[Float]], 0)
    ).toDF("id", "v", "b").repartition(2)
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(col("id"),
          ResidualE6Expr.residualE6(col("v"), col("b"), means).as("r"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_ => r.getSeq[Long](1))).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val a = run("true"); val b = run("false")
    assert(a == b)
    assert(a(1L).contains(Seq(500000L - 100L, 250000L + 200L)))
    assert(a(2L).contains(Seq(-1000000L - 50L, 0L - 50L)))
    assert(a(3L).isEmpty && a(4L).isEmpty)
  }

  test("residual IVFADC honors the search contract and the probe restriction") {
    val df = clusteredWithLabels
    val centroids = VectorFunctions.centroidsByLabel(df, "label", "embedding")
    val means = VectorFunctions.centroidMeansE6(df, "label", "embedding")
    val queries = df.orderBy(col("vec_id")).limit(8)
    val got = ProductQuantizer.ivfAdcResidualTopK(queries, df, centroids, means,
        m = 4, subDim = 4, kCode = 8, iters = 2,
        "vec_id", "embedding", k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 40)
    // nprobe=1 on well-separated clusters: every neighbor shares the
    // query's cluster, self excluded, ranks contiguous and dist-ordered
    assert(got.forall { case (q, _, n, _) => q % 4 == n % 4 && q != n })
    got.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5))
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
    // partition independence (distributed sums + argmin determinism)
    val again = ProductQuantizer.ivfAdcResidualTopK(queries, df.repartition(17),
        centroids, means, m = 4, subDim = 4, kCode = 8, iters = 2,
        "vec_id", "embedding", k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(r => (r._1, r._2)).toSeq == got.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("residual codes recenter an offset cluster (what raw codes cannot)") {
    import spark.implicits._
    // one tight cluster far from the origin: raw PQ must spend its code
    // budget on the offset; residual codes see the cluster centered
    val rows = (0L until 40L).map { id =>
      (id, Array.tabulate(8)(i => 50f + (((id * 7 + i * 13) % 11).toFloat - 5f) / 100f), 0)
    }
    val df = rows.toDF("vec_id", "embedding", "label").localCheckpoint()
    val means = VectorFunctions.centroidMeansE6(df, "label", "embedding")
    // the exact e6 mean sits inside the cluster, so residuals are small
    val resid = df.withColumn("r",
      ResidualE6Expr.residualE6(col("embedding"), lit(0), means))
    val maxAbs = resid.select(max(aggregate(col("r"), lit(0L),
      (acc, x) => greatest(acc, abs(x))))).head().getLong(0)
    assert(maxAbs <= 120000L, s"residuals must be offset-free, max |r| = $maxAbs")
    // while the raw quantization of the same vectors is offset-sized
    assert(rows.head._2.head * 1e6 > 4e7)
  }
}
