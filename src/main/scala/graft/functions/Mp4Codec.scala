package graft.functions

/** Stock-JDK MP4/ISO-BMFF container parser behind the
  * [[graft.ops.Multimodal]] metadata seam — the video counterpart of
  * [[AudioCodec]]'s RIFF/WAVE parse: payloads that really are ISO
  * Base Media files (ISO/IEC 14496-12 box layout) yield their REAL
  * container metadata — brand, duration, track dimensions, sample
  * codec fourcc — without any frame decode (no JDK video codec
  * exists; frame decode stays the documented stub in
  * [[graft.ops.Multimodal.decodeKernel]]). Anything that is not a
  * well-formed BMFF prefix returns null and the caller keeps its
  * declared metadata.
  *
  * The parser is a hand-rolled walk of the box tree (big-endian
  * sizes, `size==1` → 64-bit largesize, `size==0` → extends to end;
  * containers `moov`/`trak`/`mdia`/`minf`/`stbl` recursed, leaves
  * read at fixed offsets per the spec):
  *  - `ftyp` → major brand;
  *  - `moov/mvhd` (v0 and v1) → timescale + duration, surfaced as
  *    integer milliseconds (floor — bit-portable, no float);
  *  - `moov/trak/tkhd` (v0/v1) → width/height, stored as 16.16
  *    fixed-point, surfaced as the integer part;
  *  - `moov/trak/mdia/hdlr` → handler type, so dimensions and codec
  *    come from the VIDEO track (`vide`) when one exists, first track
  *    otherwise;
  *  - `.../stbl/stsd` → first sample entry's format fourcc (`avc1`,
  *    `hev1`, `mp4v`, …) — the codec identity a router needs.
  *
  * Bounds discipline matches the WAV parser: every read is checked
  * against the payload length; a truncated/hostile box tree returns
  * null rather than throwing, so the kernel is safe on arbitrary
  * bytes at scan speed. Parsing is exact integer work — deterministic
  * on every JVM. */
object Mp4Codec {

  /** Parsed container metadata; `width`/`height`/`codec`/`handler`
    * come from the video track (fallback: first track), 0/null when
    * absent. `handler` is the track's hdlr fourcc (`vide`, `soun`, …)
    * so callers can honor audio-only BMFF (M4A) as audio. */
  final case class Mp4Meta(majorBrand: String, durationMs: Long,
                           width: Int, height: Int, codec: String,
                           handler: String)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** One parsed track, accumulated during the walk. Sample-table
    * fields (r15): enough of stbl to address samples as byte ranges —
    * stsz (sizes), stco/co64 (chunk offsets), stsc (samples per
    * chunk) — which is all MJPEG frame extraction needs, because each
    * MJPEG sample IS one complete JPEG. */
  private final class Track {
    var handler: String = null
    var width: Int = 0
    var height: Int = 0
    var codec: String = null
    var sizes: Array[Int] = null      // per-sample sizes (stsz table form)
    var fixedSize: Int = 0            // uniform sample size (stsz short form)
    var sampleCount: Int = 0
    var chunkOffsets: Array[Long] = null // stco/co64, absolute file offsets
    var stscFirst: Array[Int] = null  // parallel stsc runs: first_chunk (1-based)
    var stscPer: Array[Int] = null    //                     samples_per_chunk
  }

  private final class State {
    var majorBrand: String = null
    var timescale: Long = 0L
    var duration: Long = 0L
    var tracks: List[Track] = Nil
    var bad: Boolean = false
  }

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** A legitimate tree is ≤ ~5 containers deep (moov/trak/mdia/minf/
    * stbl); a hostile payload nesting containers every 8 bytes would
    * otherwise recurse payload.length/8 frames deep. */
  private val MaxDepth = 16

  /** Walk the boxes in payload[from, to); `track` is the enclosing
    * trak's accumulator (null at file/moov level). */
  private def walk(b: Array[Byte], from: Int, to: Int, st: State, track: Track,
                   depth: Int = 0): Unit = {
    if (depth > MaxDepth) { st.bad = true; return }
    var off = from
    while (off < to && !st.bad) {
      if (off + 8 > to) { st.bad = true; return }
      var size = be32(b, off)
      val typ = fourcc(b, off + 4)
      var hdr = 8
      if (size == 1L) {
        if (off + 16 > to) { st.bad = true; return }
        size = be64(b, off + 8); hdr = 16
      } else if (size == 0L) size = (to - off).toLong // to end of enclosing box
      if (size < hdr || off + size > to) { st.bad = true; return }
      val body = off + hdr
      val end = off + size.toInt
      typ match {
        case "ftyp" =>
          if (body + 4 > end) { st.bad = true; return }
          st.majorBrand = fourcc(b, body)
        case "mvhd" =>
          if (body + 4 > end) { st.bad = true; return }
          val v = b(body) & 0xff
          if (v == 1) {
            // v1 reads be32 at body+20 and be64 at body+24 — needs 32 bytes
            if (body + 32 > end) { st.bad = true; return }
            st.timescale = be32(b, body + 20)
            st.duration = be64(b, body + 24)
          } else {
            if (body + 20 > end) { st.bad = true; return }
            st.timescale = be32(b, body + 12)
            st.duration = be32(b, body + 16)
          }
        case "tkhd" =>
          if (track != null) {
            if (body + 4 > end) { st.bad = true; return }
            val v = b(body) & 0xff
            // v0: 4(ver/flags) + 4 ctime + 4 mtime + 4 track_id +
            // 4 reserved + 4 duration + 8 reserved + 2+2+2+2
            // (layer/alt/volume/reserved) + 36 matrix = width at 76;
            // v1 widens ctime/mtime/duration to 8 bytes (+12)
            val dimOff = body + (if (v == 1) 88 else 76)
            if (dimOff + 8 > end) { st.bad = true; return }
            track.width = (be32(b, dimOff) >>> 16).toInt // 16.16 fixed
            track.height = (be32(b, dimOff + 4) >>> 16).toInt
          }
        case "hdlr" =>
          if (track != null) {
            if (body + 12 > end) { st.bad = true; return }
            track.handler = fourcc(b, body + 8)
          }
        case "stsd" =>
          if (track != null) {
            if (body + 8 > end) { st.bad = true; return }
            val entries = be32(b, body + 4)
            if (entries >= 1) {
              if (body + 16 > end) { st.bad = true; return }
              track.codec = fourcc(b, body + 12)
            }
          }
        case "stsz" =>
          if (track != null) {
            // ver/flags, sample_size, sample_count[, size per sample]
            if (body + 12 > end) { st.bad = true; return }
            val fixed = be32(b, body + 4)
            val n = be32(b, body + 8)
            if (n < 0 || n > Int.MaxValue) { st.bad = true; return }
            track.sampleCount = n.toInt
            if (fixed != 0L) {
              if (fixed > Int.MaxValue) { st.bad = true; return }
              // the samples live inside this payload, so n fixed-size
              // samples must physically fit in it — same bound as the
              // table form's 4·n-fits-the-box, and it caps hostile
              // counts (a ~200-byte file claiming sample_count=2^31-1
              // would otherwise drive a ~17 GB frame-list allocation)
              if (fixed * n > b.length) { st.bad = true; return }
              track.fixedSize = fixed.toInt
            } else {
              // the table must physically fit inside the box — this
              // bound also caps the allocation on hostile counts
              if (body + 12 + 4L * n > end) { st.bad = true; return }
              val t = new Array[Int](n.toInt)
              var i = 0
              while (i < t.length) {
                val v = be32(b, body + 12 + 4 * i)
                if (v > Int.MaxValue) { st.bad = true; return }
                t(i) = v.toInt; i += 1
              }
              track.sizes = t
            }
          }
        case "stco" | "co64" =>
          if (track != null) {
            if (body + 8 > end) { st.bad = true; return }
            val n = be32(b, body + 4)
            val w = if (typ == "co64") 8 else 4
            if (n < 0 || body + 8 + w.toLong * n > end) { st.bad = true; return }
            val t = new Array[Long](n.toInt)
            var i = 0
            while (i < t.length) {
              t(i) = if (w == 8) be64(b, body + 8 + 8 * i) else be32(b, body + 8 + 4 * i)
              i += 1
            }
            track.chunkOffsets = t
          }
        case "stsc" =>
          if (track != null) {
            if (body + 8 > end) { st.bad = true; return }
            val n = be32(b, body + 4)
            if (n < 0 || body + 8 + 12L * n > end) { st.bad = true; return }
            val first = new Array[Int](n.toInt)
            val per = new Array[Int](n.toInt)
            var i = 0
            while (i < first.length) {
              val f = be32(b, body + 8 + 12 * i)
              val p = be32(b, body + 12 + 12 * i)
              if (f < 1 || f > Int.MaxValue || p < 0 || p > Int.MaxValue) {
                st.bad = true; return
              }
              first(i) = f.toInt; per(i) = p.toInt; i += 1
            }
            track.stscFirst = first; track.stscPer = per
          }
        case "trak" =>
          val t = new Track
          st.tracks = st.tracks :+ t
          walk(b, body, end, st, t, depth + 1)
        case t2 if Containers.contains(t2) =>
          walk(b, body, end, st, track, depth + 1)
        case _ => // mdat/free/udta/…: opaque, skip
      }
      off = end
    }
  }

  /** Parse the container metadata, or null when the payload is not a
    * BMFF file this parser accepts (no leading ftyp, torn box tree,
    * missing moov/mvhd). */
  def parseMeta(payload: Array[Byte]): Mp4Meta = {
    if (payload == null || payload.length < 16) return null
    // an ISO-BMFF file leads with ftyp (size >= 16, sane type)
    if (fourcc(payload, 4) != "ftyp") return null
    val st = new State
    walk(payload, 0, payload.length, st, null)
    if (st.bad || st.majorBrand == null || st.timescale <= 0) return null
    val video = st.tracks.find(_.handler == "vide").orElse(st.tracks.headOption)
    Mp4Meta(st.majorBrand,
      st.duration * 1000L / st.timescale,
      video.map(_.width).getOrElse(0),
      video.map(_.height).getOrElse(0),
      video.flatMap(t => Option(t.codec)).orNull,
      video.flatMap(t => Option(t.handler)).orNull)
  }

  /** Sample-entry fourccs whose samples are complete JPEGs: `jpeg`
    * (QuickTime Motion-JPEG), `mjpa`/`mjpb` (Motion-JPEG A/B — A is
    * SOI-led standard JPEG with extra APP markers; B is not SOI-led
    * and the JPEG filter below drops it, by design). */
  private val MjpegEntries = Set("jpeg", "mjpa", "mjpb", "MJPG")

  /** The MJPEG frames of a BMFF payload (each a complete JPEG, bytes
    * exactly as stored, decode order), or null when the payload is not
    * BMFF, has no MJPEG video track, or its sample tables don't
    * resolve to in-bounds JPEG samples — null routes the caller to the
    * stub branch, the [[AviCodec.mjpegFrames]] contract.
    *
    * Sample addressing per ISO/IEC 14496-12 §8.7: chunk i's byte
    * offset from stco/co64, its sample count from the stsc run whose
    * `first_chunk` is the largest ≤ i, consecutive samples packed
    * back-to-back with stsz sizes. All integer work, every slice
    * bounds-checked against the payload. */
  def mjpegFrames(payload: Array[Byte]): Array[Array[Byte]] = {
    if (payload == null || payload.length < 16) return null
    if (fourcc(payload, 4) != "ftyp") return null
    val st = new State
    walk(payload, 0, payload.length, st, null)
    if (st.bad) return null
    val t = st.tracks.find(t => t.handler == "vide" && t.codec != null &&
      MjpegEntries.contains(t.codec)).orNull
    if (t == null || t.chunkOffsets == null || t.stscFirst == null ||
        t.stscFirst.isEmpty || (t.sizes == null && t.fixedSize <= 0)) return null
    val nSamples = if (t.sizes != null) t.sizes.length else t.sampleCount
    if (nSamples <= 0) return null
    // no size hint: ArrayBuffer(n) eagerly allocates the backing
    // array, and nSamples is attacker-influenced (bounded above by the
    // stsz fit checks, but defense-in-depth costs only amortized
    // appends — the hostile-bytes path must never OOM)
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var sample = 0
    var ci = 0 // 0-based chunk index
    var run = 0 // current stsc run
    while (ci < t.chunkOffsets.length && sample < nSamples) {
      // advance to the run owning chunk ci+1 (runs are ascending)
      while (run + 1 < t.stscFirst.length && t.stscFirst(run + 1) <= ci + 1) run += 1
      val inChunk = if (t.stscFirst(run) <= ci + 1) t.stscPer(run) else 0
      var off = t.chunkOffsets(ci)
      var k = 0
      while (k < inChunk && sample < nSamples) {
        val sz = if (t.sizes != null) t.sizes(sample) else t.fixedSize
        if (sz <= 0 || off < 0 || off + sz > payload.length) return null
        out += java.util.Arrays.copyOfRange(payload, off.toInt, (off + sz).toInt)
        off += sz; sample += 1; k += 1
      }
      ci += 1
    }
    // SOI-led samples only — same filter as the AVI path
    val jpegs = out.filter(f =>
      f.length >= 2 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
    if (jpegs.isEmpty) null else jpegs.toArray
  }
}
