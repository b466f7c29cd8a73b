package graft.functions

/** Stock-JDK AVI/RIFF container parser — the piece that makes VIDEO
  * partially real with zero new dependencies: MJPEG frames ARE JPEGs,
  * and `javax.imageio` already decodes those ([[ImageCodec]]), so an
  * AVI carrying an MJPEG stream yields its actual frames at scan
  * speed. Reference analog: none (north-star extension beyond the
  * reference's multimodal surface; cf. the r13 `Mp4Codec` metadata
  * parse this completes).
  *
  * Layout walked (Microsoft AVI RIFF form): `RIFF <size> 'AVI '` with
  * a `LIST hdrl` carrying `avih` (MainAVIHeader: µs per frame, total
  * frames, width, height at fixed LE offsets) and `LIST strl` / `strh`
  * (stream type + handler fourcc), and a `LIST movi` whose `##dc` /
  * `##db` chunks are the video frames — for MJPEG, each is one
  * complete JPEG (SOI-led). The index (`idx1`) is ignored: frames are
  * taken in stream order, which IS presentation order for MJPEG.
  *
  * Bounds discipline matches [[AudioCodec]]/[[Mp4Codec]]: every read
  * is length-checked, LIST recursion is depth-capped, and any torn or
  * hostile payload returns null rather than throwing — safe on
  * arbitrary bytes inside a scan-stage kernel. All parsing is integer
  * work; frame BYTES are returned exactly as stored (the lossy step
  * happened at encode time, not here). */
object AviCodec {

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parsed AVI metadata; `handler` is the first video stream's
    * fccHandler (e.g. "MJPG"), null when no strh was found. */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Long,
                           totalFrames: Int, handler: String)

  private val MaxDepth = 16

  private final class State {
    var width = 0; var height = 0
    var usPerFrame = 0L; var totalFrames = 0
    var handler: String = null
    var frames: List[Array[Byte]] = Nil
    var haveAvih = false
    var bad = false
  }

  /** Walk chunks in payload[from, to). */
  private def walk(b: Array[Byte], from: Int, to: Int, st: State, depth: Int): Unit = {
    if (depth > MaxDepth) { st.bad = true; return }
    var off = from
    while (off + 8 <= to && !st.bad) {
      val id = tag(b, off)
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size > to) { st.bad = true; return }
      val body = off + 8
      id match {
        case "LIST" =>
          if (size >= 4) walk(b, body + 4, body + size, st, depth + 1)
        case "avih" =>
          // MainAVIHeader: dwMicroSecPerFrame@0, dwTotalFrames@16,
          // dwWidth@32, dwHeight@36 (all LE32)
          if (size < 40) { st.bad = true; return }
          st.usPerFrame = le32(b, body) & 0xffffffffL
          st.totalFrames = le32(b, body + 16)
          st.width = le32(b, body + 32)
          st.height = le32(b, body + 36)
          st.haveAvih = true
        case "strh" =>
          // AVISTREAMHEADER: fccType@0, fccHandler@4 — keep the first
          // VIDEO stream's handler
          if (size >= 8 && st.handler == null && tag(b, body) == "vids")
            st.handler = tag(b, body + 4)
        case _ =>
          // ##dc / ##db inside movi: a compressed/uncompressed video
          // frame chunk (two digits = stream number)
          if (size > 0 && id.length == 4 &&
              Character.isDigit(id.charAt(0)) && Character.isDigit(id.charAt(1)) &&
              (id.endsWith("dc") || id.endsWith("db")))
            st.frames = java.util.Arrays.copyOfRange(b, body, body + size) :: st.frames
      }
      off = body + size + (size & 1) // chunks are word-aligned
    }
  }

  private def parse(payload: Array[Byte]): State = {
    if (payload == null || payload.length < 12) return null
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "AVI ") return null
    val riffSize = le32(payload, 4)
    if (riffSize < 4 || 8 + riffSize > payload.length) return null
    val st = new State
    walk(payload, 12, 8 + riffSize, st, 0)
    if (st.bad || !st.haveAvih) null else st
  }

  /** Container metadata, or null when the payload is not an AVI this
    * parser accepts. */
  def parseMeta(payload: Array[Byte]): AviMeta = {
    val st = parse(payload)
    if (st == null) null
    else AviMeta(st.width, st.height, st.usPerFrame, st.totalFrames, st.handler)
  }

  /** The MJPEG frames (each a complete JPEG, bytes exactly as stored,
    * stream order), or null when the payload is not an AVI or carries
    * no JPEG-led frame chunks — null routes the caller to its stub
    * branch, exactly like [[AudioCodec.decodeWav]]. */
  def mjpegFrames(payload: Array[Byte]): Array[Array[Byte]] = {
    val st = parse(payload)
    if (st == null) return null
    // SOI-led chunks only: a ##dc chunk of some other codec is not a
    // frame this path can decode
    val jpegs = st.frames.reverse.filter(f =>
      f.length >= 2 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
    if (jpegs.isEmpty) null else jpegs.toArray
  }
}
