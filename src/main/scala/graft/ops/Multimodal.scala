package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support for the training-data pipeline layer:
  * image/audio/video payloads ride as opaque `binary` columns with a
  * typed metadata struct, and per-asset compute (decode, resize,
  * frame-sample, feature-extract) runs as partition-parallel batch
  * functions over the binary column.
  *
  * The IMAGE codec is real (stock-JDK javax.imageio: PNG/JPEG →
  * integer luma grid, [[graft.functions.ImageCodec]]), WAV audio
  * decode is real ([[graft.functions.AudioCodec]]), and video
  * CONTAINER metadata is real ([[graft.functions.Mp4Codec]] ISO-BMFF
  * parse via [[probeContainerMeta]]); video FRAME decode has no JDK
  * codec, so that one branch takes a clearly-marked deterministic
  * stub. Everything Spark-side is
  * real and tested either way: the schema contract, the mapPartitions
  * batch shape (the Scala analogue of a pandas-batch UDF: one
  * iterator per partition, streaming, no driver collection),
  * partitioning control for codec-heavy stages, and the metadata
  * bookkeeping.
  *
  * Scale notes: binary payloads never pass through a wide shuffle —
  * asset transforms are map-only; only extracted features (small,
  * fixed-width) flow into joins/aggregations downstream. For skewed
  * asset sizes, `repartitionForDecode` spreads bytes evenly by
  * round-robin on a salt of the asset id.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // jpeg | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", MetaSchema)))

  final case class AssetMeta(media_type: String, format: String, width: Option[Int],
                             height: Option[Int], duration_ms: Option[Long], size_bytes: Long)
  final case class Asset(asset_id: Long, payload: Array[Byte], meta: AssetMeta)
  final case class DecodedFeatures(asset_id: Long, ok: Boolean, feature: Array[Float],
                                   out_width: Int, out_height: Int)

  /** Wrap any table with a binary-able column into the asset contract
    * (used by tests and the demo query: documents' text bytes stand in
    * for an opaque payload). */
  def assetsFromBinary(df: DataFrame, idCol: String, binCol: String,
                       mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(binCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        length(col(binCol).cast("binary")).cast(LongType).as("size_bytes")).as("meta"))

  /** Spread codec work evenly: decode cost follows payload bytes, not
    * row count, so hash-partition on asset id to break up any
    * size-correlated clustering from the source layout. */
  def repartitionForDecode(assets: DataFrame, partitions: Int): DataFrame =
    assets.repartition(partitions, col("asset_id"))

  /** Make the declared meta struct HONEST from the payload bytes —
    * container-level parses only, no frame decode:
    *  - MP4/ISO-BMFF ([[graft.functions.Mp4Codec]]): real moov/mvhd
    *    duration, tkhd width/height, stsd codec fourcc slotted into
    *    `format` as `"mp4/<fourcc>"`, media type from the track
    *    handler (audio-only BMFF honors as audio);
    *  - AVI ([[graft.functions.AviCodec]]): real avih width/height and
    *    duration (µs-per-frame × frames), stream handler as
    *    `"avi/<handler>"`;
    *  - RIFF/WAVE ([[graft.functions.AudioCodec]]): real duration from
    *    the decoded frame count and sample rate.
    * Unrecognized payloads keep their declared meta untouched (the
    * probe never degrades information). Map-only over the binary
    * column — same batch shape as [[decodeAndFeaturize]], payload
    * bytes never shuffle, and at 100 TB this is a scan-stage
    * projection like the fingerprint kernels. */
  def probeContainerMeta(spark: SparkSession, assets: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val mp4 = graft.functions.Mp4Codec.parseMeta(a.payload)
        if (mp4 != null) {
          // BMFF also carries audio-only files (M4A: hdlr 'soun') —
          // honor the selected track's handler, not a blanket "video"
          val mediaType = mp4.handler match {
            case "vide" => "video"
            case "soun" => "audio"
            case _      => a.meta.media_type
          }
          a.copy(meta = a.meta.copy(
            media_type = mediaType,
            format = if (mp4.codec == null) "mp4" else s"mp4/${mp4.codec}",
            width = if (mp4.width > 0) Some(mp4.width) else a.meta.width,
            height = if (mp4.height > 0) Some(mp4.height) else a.meta.height,
            duration_ms = Some(mp4.durationMs)))
        } else {
          val avi = graft.functions.AviCodec.parseMeta(a.payload)
          if (avi != null) {
            a.copy(meta = a.meta.copy(
              media_type = "video",
              format = if (avi.handler == null) "avi"
                       else s"avi/${avi.handler.trim.toLowerCase}",
              width = if (avi.width > 0) Some(avi.width) else a.meta.width,
              height = if (avi.height > 0) Some(avi.height) else a.meta.height,
              duration_ms = Some(avi.usPerFrame * avi.totalFrames / 1000L)))
          } else {
            val pcm = graft.functions.AudioCodec.decodeWav(a.payload)
            if (pcm != null)
              a.copy(meta = a.meta.copy(media_type = "audio", format = "wav",
                duration_ms = Some(pcm.samples.length * 1000L / pcm.sampleRate)))
            else a
          }
        }
      }
    }
  }

  // ---------------------------------------------------------------------------
  // CODEC SEAM — the image path is REAL (stock-JDK javax.imageio via
  // [[graft.functions.ImageCodec]]: PNG/JPEG decode, integer luma,
  // deterministic box resize), so is uncompressed audio
  // ([[graft.functions.AudioCodec]]: RIFF/WAVE PCM parse + Goertzel
  // band energies), and — r14 — so is MJPEG video
  // ([[graft.functions.AviCodec]]: AVI RIFF walk, frames are JPEGs the
  // image path already decodes). Only NON-MJPEG video codecs and
  // compressed audio still hit the clearly-marked deterministic stub
  // below (no JDK codec exists for them); replace that branch with
  // ffmpeg and every signature, schema and batch shape stays identical.
  // ---------------------------------------------------------------------------

  /** Decode + resize + featurize one payload into the fixed 8-wide
    * feature vector.
    *
    * Real branches: PNG/JPEG (box-resize to targetH×targetW integer
    * luma, 8-bin luminance histogram — pixel counts, so the vector
    * sums to targetW·targetH; deterministic for lossless inputs);
    * AVI/MJPEG video (first frame through the same JPEG path);
    * RIFF/WAVE audio (Goertzel band energies, same mass envelope).
    *
    * STUB branch (what remains — non-MJPEG video codecs, compressed
    * audio, unknown bytes): the original deterministic byte fold,
    * scaled to the same targetW·targetH mass so downstream consumers
    * see one envelope. */
  private[ops] def decodeKernel(payload: Array[Byte], targetW: Int, targetH: Int): Array[Float] = {
    val out = new Array[Float](8)
    if (payload == null || payload.isEmpty) return out
    var grid = graft.functions.ImageCodec.lumaGrid(payload, targetH, targetW)
    if (grid == null) {
      // real VIDEO branch (r14, widened r15): an AVI or MP4 carrying
      // MJPEG frames decodes its FIRST frame through the stock-JDK
      // JPEG path — same histogram envelope as a still image. The stub
      // below now covers only non-MJPEG video codecs and compressed
      // audio.
      val frames = {
        val avi = graft.functions.AviCodec.mjpegFrames(payload)
        if (avi != null) avi else graft.functions.Mp4Codec.mjpegFrames(payload)
      }
      if (frames != null)
        grid = graft.functions.ImageCodec.lumaGrid(frames(0), targetH, targetW)
    }
    val pcm = if (grid == null) graft.functions.AudioCodec.decodeWav(payload) else null
    if (grid != null) {
      var i = 0
      while (i < grid.length) {
        out(math.min(7, (grid(i) >> 5).toInt)) += 1.0f
        i += 1
      }
    } else if (pcm != null && pcm.samples.length >= 8) {
      // real audio branch: 8 log-spaced Goertzel band energies over the
      // whole clip (a 1×8 [[graft.functions.AudioCodec.energyGrid]]),
      // normalized to the image branch's targetW·targetH mass so every
      // media type shares one feature envelope
      val e = graft.functions.AudioCodec.energyGrid(pcm, 1, 8)
      var total = 0.0
      var j = 0
      while (j < 8) { total += e(j); j += 1 }
      if (total > 0) {
        j = 0
        while (j < 8) {
          out(j) = (e(j) / total * (targetW * targetH)).toFloat; j += 1
        }
      }
    } else {
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      while (j < 8) { out(j) = out(j) / payload.length * (targetW * targetH); j += 1 }
    }
    out
  }

  /** Decode + resize + feature-extract as a partition-parallel batch
    * function: one invocation per partition, rows stream through an
    * iterator (the JVM analogue of a pandas-batch UDF — constant
    * memory per partition, codec objects reusable across the batch). */
  def decodeAndFeaturize(spark: SparkSession, assets: DataFrame,
                         targetW: Int = 32, targetH: Int = 32): Dataset[DecodedFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // per-partition setup would initialise the codec once here
      it.map { a =>
        val ok = a.payload != null && a.payload.nonEmpty
        val feat = decodeKernel(a.payload, targetW, targetH)
        DecodedFeatures(a.asset_id, ok, feat, targetW, targetH)
      }
    }
  }

  /** REAL video frame extraction (r14, widened r15 to MJPEG-in-MP4):
    * AVI and BMFF payloads carrying MJPEG explode to one row per
    * frame, each frame a complete JPEG exactly as stored
    * ([[graft.functions.AviCodec.mjpegFrames]] /
    * [[graft.functions.Mp4Codec.mjpegFrames]] — the latter resolves
    * frames through the stsz/stsc/stco sample tables); other payloads
    * yield no rows (they stay on [[sampleFrames]]' pseudo-frame stub).
    * A generator over the partition iterator — payload bytes never
    * shuffle; at 100 TB this is a scan-stage flatMap like the
    * fingerprint kernels, and the emitted frames are the decodable
    * currency every image operator downstream already accepts. */
  def videoFrames(spark: SparkSession, assets: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      val avi = graft.functions.AviCodec.mjpegFrames(a.payload)
      val frames = if (avi != null) avi else graft.functions.Mp4Codec.mjpegFrames(a.payload)
      if (frames == null) Iterator.empty
      else frames.iterator.zipWithIndex.map { case (f, i) => Frame(a.asset_id, i, f) }
    }
  }

  /** Perceptual near-duplicate FRAME pairs across video assets — the
    * [[imageNearDups]] machinery run on real MJPEG frames: extract
    * ([[videoFrames]]), dHash every frame (stock-JDK JPEG decode inside
    * the codegen'd kernel), block-join within `maxHamming`. Frame
    * identity rides a composite id (asset_id · 2²⁰ + frame_idx — AVIs
    * cap far below a million frames per asset) through the shared
    * hamming blocks and is decomposed back on output. Returns
    * (asset_a, frame_a, asset_b, frame_b, hamming), cross- and
    * intra-asset pairs alike, self-pairs excluded by the id order. */
  def videoFrameNearDups(spark: SparkSession, assets: DataFrame,
                         maxHamming: Int = 3): DataFrame = {
    val frames = videoFrames(spark, assets)
      .select((col("asset_id") * lit(1L << 20) + col("frame_idx")).as("fid"),
        col("frame_bytes"))
    val dups = imageNearDups(frames, "fid", "frame_bytes", maxHamming)
    dups.select(
      shiftrightunsigned(col("id_a"), 20).as("asset_a"),
      col("id_a").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("frame_a"),
      shiftrightunsigned(col("id_b"), 20).as("asset_b"),
      col("id_b").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("frame_b"),
      col("hamming"))
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th
    * chunk of the payload as a pseudo-frame (stub for keyframe
    * extraction); one row per sampled frame — a generator (flatMap)
    * over the partition iterator. */
  final case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  def sampleFrames(spark: SparkSession, assets: DataFrame,
                   frameSize: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      if (a.payload == null || a.payload.isEmpty) Iterator.empty
      else a.payload.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (bytes, i) => Frame(a.asset_id, i, bytes) }
    }
  }

  /** Perceptual near-duplicate pairs over image assets (the multimodal
    * analogue of the text SimHash family): fingerprint every payload
    * with the 60-bit dHash ([[graft.functions.ImageDHash]] — codegen'd;
    * real javax.imageio decode for PNG/JPEG, integer byte-fold
    * fallback otherwise), then find all pairs
    * within `maxHamming` via [[Dedup.hammingNearDups]]'s pigeonhole
    * combination blocks — candidate generation is bucketed equi-joins,
    * never an all-pairs product, so the shape survives a 100 TB asset
    * table exactly like text simhash does.
    *
    * Scale notes: the fingerprint is map-only over the binary column
    * (payload bytes never shuffle — only the 8-byte hash plus id flows
    * into the block join); the real decode already rides inside
    * [[graft.functions.DHashKernel.hash]] without touching the plan.
    * Returns (id_a, id_b, hamming). */
  def imageNearDups(assets: DataFrame, idCol: String = "asset_id",
                    payloadCol: String = "payload", maxHamming: Int = 3): DataFrame = {
    graft.functions.ImageExpressions.register(assets.sparkSession)
    val hashed = assets.select(
      col(idCol).as("id"),
      graft.functions.ImageExpressions.imageDHash(col(payloadCol)).as("dhash"))
    Dedup.hammingNearDups(hashed, "id", "dhash", maxHamming)
  }

  /** Acoustic near-duplicate pairs over audio assets — the audio member
    * of the perceptual-hash family: fingerprint every payload with the
    * 60-bit Haitsma–Kalker-style second-order energy-delta hash
    * ([[graft.functions.AudioFingerprint]] — codegen'd, integer-exact,
    * stub decode documented there), then find all pairs within
    * `maxHamming` via [[Dedup.hammingNearDups]] — the same pigeonhole
    * combination blocks as text simhash and image dHash, so candidate
    * generation is bucketed equi-joins, never an all-pairs product.
    *
    * Scale notes: identical envelope to [[imageNearDups]] — the
    * fingerprint is a scan-stage codegen projection, payload bytes
    * never shuffle (only id + 8-byte hash reach the block join), and a
    * real decoder+STFT slots into the kernel without touching the
    * plan. Returns (id_a, id_b, hamming). */
  def audioNearDups(assets: DataFrame, idCol: String = "asset_id",
                    payloadCol: String = "payload", maxHamming: Int = 3): DataFrame = {
    graft.functions.AudioExpressions.register(assets.sparkSession)
    val hashed = assets.select(
      col(idCol).as("id"),
      graft.functions.AudioExpressions.audioFingerprint(col(payloadCol)).as("afp"))
    Dedup.hammingNearDups(hashed, "id", "afp", maxHamming)
  }

  /** Metadata-only profile — never touches payload bytes, so Parquet
    * column pruning keeps the scan narrow even on multi-TB asset
    * tables. */
  def metaProfile(assets: DataFrame): DataFrame =
    assets.groupBy(col("meta.media_type").as("media_type"), col("meta.format").as("format"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("meta.size_bytes")).as("total_bytes"),
        max(col("meta.size_bytes")).as("max_bytes"))
}
