package graft.ops

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class CosineNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  test("random-hyperplane LSH finds planted high-cosine pairs, verifies exactly") {
    // plant: for the first 20 vectors, a slightly-perturbed copy
    val base = Tables.embeddings(spark, sf0001).limit(20)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val rnd = new scala.util.Random(7)
    val perturbed = base.map { case (id, v) =>
      val noisy = v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
      val norm = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
      (id + 1000L, noisy.map(_ / norm))
    }
    val df = (base ++ perturbed).toSeq.toDF("vec_id", "embedding")

    val pairs = Dedup.cosineNearDups(df, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // every planted pair recovered (cosine ~0.99 -> expected hamming ~2)
    val found = pairs.map(p => (p._1, p._2)).toSet
    base.foreach { case (id, _) =>
      assert(found.contains((id, id + 1000L)), s"missing planted pair $id")
    }
    // nothing below threshold leaks through
    assert(pairs.forall(_._3 >= 0.95))
    // and no spurious unplanted originals pair up
    assert(!pairs.exists(p => p._1 < 1000 && p._2 < 1000))
  }

  test("IVF-bucketed near-dup (scale path) recovers planted pairs through shared buckets") {
    val base = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding", $"label").limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val rnd = new scala.util.Random(11)
    val perturbed = base.take(15).map { case (id, v, lbl) =>
      val noisy = v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
      val norm = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
      (id + 1000L, noisy.map(_ / norm), lbl)
    }
    val df = (base ++ perturbed).toSeq.toDF("vec_id", "embedding", "label")
    val centroids = graft.functions.VectorFunctions.centroidsByLabel(df, "label", "embedding")

    val pairs = Dedup.cosineNearDupsIVF(df, "vec_id", "embedding", centroids,
      minCosine = 0.95, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val found = pairs.map(p => (p._1, p._2)).toSet
    base.take(15).foreach { case (id, _, _) =>
      assert(found.contains((id, id + 1000L)), s"missing planted pair $id")
    }
    assert(pairs.forall(_._3 >= 0.95))
  }
}
