package graft.functions

/** Stock-JDK audio codec behind the [[AudioFingerprintKernel]] /
  * [[graft.ops.Multimodal.decodeKernel]] seam — the audio counterpart
  * of [[ImageCodec]]: payloads that really are RIFF/WAVE PCM decode to
  * samples and get REAL spectral band energies; anything else returns
  * null and the caller falls back to the documented byte-fold stub, so
  * the synthetic oracle fixtures keep their hashes while real WAV
  * bytes fingerprint on true spectra.
  *
  * The container has no media libraries, so the parser is hand-rolled
  * over the RIFF layout (chunked; little-endian sizes; `fmt ` carries
  * format/channels/rate/bits, `data` the frames) — deliberately, since
  * a fixed parse is bit-deterministic in a way a pluggable
  * javax.sound SPI chain need not be. Accepted: PCM (format 1),
  * 8-bit unsigned or 16-bit signed LE, any channel count (channels
  * SUM to mono — integer-exact, and a uniform gain still scales the
  * mono signal uniformly, which the fingerprint's double difference
  * then cancels).
  *
  * Band energies come from Goertzel power at each band's geometric
  * center frequency — a real (if minimal) spectral measurement; a
  * production deployment swaps in a full windowed STFT here and the
  * grid shape, the fingerprint bit layout, and every consumer stay
  * identical. Frequencies are log-spaced 300 Hz → min(3000, 0.45·sr)
  * Hz, the Haitsma–Kalker speech-robust band. Determinism: the only
  * transcendental is one StrictMath.cos per (band, rate) — fdlibm
  * bit-exact — and JDK 17 floating point is always-strictfp, so the
  * recurrence is bit-identical on every JVM.
  */
object AudioCodec {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decoded mono PCM: channel-SUMMED samples + the sample rate. */
  final case class Pcm(samples: Array[Int], sampleRate: Int)

  /** RIFF/WAVE PCM decode, or null when the payload is not a WAV this
    * parser accepts (wrong magic, non-PCM, exotic widths, truncated
    * chunks) — null routes the caller to its stub branch. */
  def decodeWav(payload: Array[Byte]): Pcm = {
    if (payload == null || payload.length < 44) return null
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return null
    var off = 12
    var channels = 0; var rate = 0; var bits = 0; var haveFmt = false
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val size = le32(payload, off + 4)
      if (size < 0 || off + 8 + size > payload.length) return null
      id match {
        case "fmt " =>
          if (size < 16) return null
          val fmt = le16(payload, off + 8)
          channels = le16(payload, off + 10)
          rate = le32(payload, off + 12)
          bits = le16(payload, off + 22)
          if (fmt != 1 || channels < 1 || rate <= 0 ||
            (bits != 8 && bits != 16)) return null
          haveFmt = true
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ => // LIST/fact/cue…: skip
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!haveFmt || dataOff < 0) return null
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    val nFrames = dataLen / frameBytes
    if (nFrames <= 0) return null
    val mono = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var s = 0
      var c = 0
      while (c < channels) {
        val o = dataOff + f * frameBytes + c * bytesPerSample
        s += (if (bits == 16) (le16(payload, o) << 16) >> 16 // sign-extend
              else (payload(o) & 0xff) - 128)
        c += 1
      }
      mono(f) = s
      f += 1
    }
    Pcm(mono, rate)
  }

  /** Goertzel power of `samples[from, from+len)` at frequency `f` Hz:
    * |Σ xₙ e^(−i2πfn/sr)|² via the standard two-term recurrence. */
  private def goertzelPower(samples: Array[Int], from: Int, len: Int,
                            f: Double, sr: Int): Double = {
    val w = 2.0 * Math.PI * f / sr
    val coeff = 2.0 * StrictMath.cos(w)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < len) {
      val s0 = samples(from + i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** `frames` × `bands` spectral energy grid: equal time slices, one
    * Goertzel power per log-spaced band center (300 Hz →
    * min(3000, 0.45·sr) Hz), row-major like the stub's fold grid. */
  def energyGrid(pcm: Pcm, frames: Int, bands: Int): Array[Double] = {
    val n = pcm.samples.length
    val frameLen = n / frames
    val out = new Array[Double](frames * bands)
    if (frameLen == 0) return out
    val fLow = 300.0
    val fHigh = math.max(fLow + 1.0, math.min(3000.0, 0.45 * pcm.sampleRate))
    val ratio = fHigh / fLow
    var fr = 0
    while (fr < frames) {
      var b = 0
      while (b < bands) {
        // geometric center of band b of `bands` log-spaced bands
        val fc = fLow * StrictMath.pow(ratio, (b + 0.5) / bands)
        out(fr * bands + b) =
          goertzelPower(pcm.samples, fr * frameLen, frameLen, fc, pcm.sampleRate)
        b += 1
      }
      fr += 1
    }
    out
  }
}
