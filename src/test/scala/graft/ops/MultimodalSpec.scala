package graft.ops

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = Multimodal.assetsFromBinary(
    Tables.documents(spark, sf0001).limit(50), "doc_id", "text", "image", "fake")

  test("asset contract: schema, typed metadata, payload size") {
    // same names/types (nullability differs: lit() metadata is non-null)
    assert(assets.schema.sql.replace(" NOT NULL", "") ==
      Multimodal.AssetSchema.sql.replace(" NOT NULL", ""))
    val r = assets.orderBy(col("asset_id")).head()
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("media_type") == "image")
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("size_bytes") > 0)
  }

  test("decodeAndFeaturize: partition-parallel batch decode, fixed-width features") {
    val feats = Multimodal.decodeAndFeaturize(spark,
      Multimodal.repartitionForDecode(assets, 4))
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.ok))
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.out_width == 32 && r.out_height == 32))
    // deterministic stub: same input -> same features
    val again = Multimodal.decodeAndFeaturize(spark, assets).collect()
    val m1 = rows.map(r => r.asset_id -> r.feature.toSeq).toMap
    assert(again.forall(r => m1(r.asset_id) == r.feature.toSeq))
  }

  test("sampleFrames: generator shape, stride honored") {
    val frames = Multimodal.sampleFrames(spark, assets.limit(5), frameSize = 64, stride = 4)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(_.frame_bytes.length <= 64))
  }

  test("metaProfile never reads payloads and aggregates by media type") {
    val prof = Multimodal.metaProfile(assets).collect()
    assert(prof.length == 1)
    assert(prof.head.getAs[Long]("n_assets") == 50L)
    assert(prof.head.getAs[Long]("total_bytes") > 0)
  }
}
