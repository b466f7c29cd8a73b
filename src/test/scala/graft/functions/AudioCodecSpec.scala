package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The real-WAV branch of the audio seam: RIFF parsing, spectral
  * sanity of the Goertzel grid, the provable gain-invariance of the
  * fingerprint's double difference, and the fallback contract (every
  * non-WAV payload must keep its pre-codec byte-fold hash — that is
  * what the q116/q120 oracles reproduce). */
class AudioCodecSpec extends AnyFunSuite {

  /** Minimal RIFF/WAVE writer: 16-bit signed LE PCM. */
  private def wav(samples: Array[Int], rate: Int, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort); buf.putInt(rate)
    buf.putInt(rate * channels * 2); buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Tone whose samples are all EVEN integers (so a 0.5 gain is an
    * exact integer halving — see the gain-invariance test). */
  private def tone(freq: Double, rate: Int, n: Int, amp: Int = 12000): Array[Int] =
    Array.tabulate(n)(i =>
      2 * ((amp * StrictMath.sin(2 * Math.PI * freq * i / rate)).toInt / 2))

  test("decodeWav: round-trips rate and sample values, sums channels") {
    val s = tone(440, 8000, 800)
    val p = AudioCodec.decodeWav(wav(s, 8000))
    assert(p != null && p.sampleRate == 8000)
    assert(p.samples.toSeq == s.toSeq)
    // stereo: identical L/R must decode to the channel SUM
    val stereo = Array.tabulate(1600)(i => s(i / 2))
    val p2 = AudioCodec.decodeWav(wav(stereo, 8000, channels = 2))
    assert(p2.samples.toSeq == s.map(_ * 2).toSeq)
  }

  test("decodeWav: rejects non-WAV, non-PCM, truncated payloads") {
    assert(AudioCodec.decodeWav(Array.fill[Byte](100)(7)) == null)
    assert(AudioCodec.decodeWav("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)) == null)
    val good = wav(tone(440, 8000, 800), 8000)
    assert(AudioCodec.decodeWav(good.take(50)) == null) // truncated data chunk
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt code 3 = IEEE float
    assert(AudioCodec.decodeWav(nonPcm) == null)
  }

  test("energy grid is spectrally real: energy concentrates at the tone's band") {
    val rate = 8000
    // band centers are log-spaced 300..3000 Hz; aim a tone at the
    // center of band 1 and another at band 11 of 13
    def center(b: Int) = 300.0 * StrictMath.pow(10.0, (b + 0.5) / 13)
    for (band <- Seq(1, 6, 11)) {
      val g = AudioCodec.energyGrid(
        AudioCodec.Pcm(tone(center(band), rate, 4000), rate), 1, 13)
      val argmax = g.indexOf(g.max)
      assert(math.abs(argmax - band) <= 1,
        s"tone at band $band peaked at $argmax: ${g.map(_.toLong).mkString(",")}")
    }
  }

  test("fingerprint: uniform power-of-two gain flips no bit (HK robustness, exact)") {
    val rate = 8000
    // a moving two-tone signal so many delta bits are exercised
    val s = Array.tabulate(6000) { i =>
      val f1 = 400 + (i / 1000) * 300
      2 * ((8000 * StrictMath.sin(2 * Math.PI * f1 * i / rate)
        + 4000 * StrictMath.sin(2 * Math.PI * 2100.0 * i / rate)).toInt / 2)
    }
    val half = s.map(_ / 2)
    val a = AudioFingerprintKernel.hash(wav(s, rate))
    val b = AudioFingerprintKernel.hash(wav(half, rate))
    assert(a == b, f"gain changed fingerprint: $a%x vs $b%x")
    assert(a != 0L, "degenerate all-zero fingerprint")
  }

  test("fingerprint: different spectra differ; small noise stays Hamming-close") {
    val rate = 8000
    val sweepUp = Array.tabulate(6000)(i =>
      (9000 * StrictMath.sin(2 * Math.PI * (400 + i * 0.25) * i / rate)).toInt)
    val sweepDown = Array.tabulate(6000)(i =>
      (9000 * StrictMath.sin(2 * Math.PI * (1900 - i * 0.25) * i / rate)).toInt)
    val a = AudioFingerprintKernel.hash(wav(sweepUp, rate))
    val d = AudioFingerprintKernel.hash(wav(sweepDown, rate))
    assert(a != d, "opposite sweeps must not collide")
    // deterministic ±1-sample dither: a near-dup, most bits stable
    val dithered = sweepUp.zipWithIndex.map { case (v, i) => v + (i % 3) - 1 }
    val n = AudioFingerprintKernel.hash(wav(dithered, rate))
    val hamming = java.lang.Long.bitCount(a ^ n)
    assert(hamming <= 12, s"dither moved $hamming of 60 bits")
  }

  test("fallback contract: non-WAV payloads keep the byte-fold hash exactly") {
    // the pre-codec fold, reproduced verbatim — q116/q120's oracle math
    def foldHash(payload: Array[Byte]): Long = {
      val energy = new Array[Long](78)
      payload.indices.foreach(i => energy(i % 78) += (payload(i) & 0xff))
      var h = 0L
      for (f <- 1 until 6; b <- 0 until 12) {
        val cur = energy(f * 13 + b) - energy(f * 13 + b + 1)
        val prev = energy((f - 1) * 13 + b) - energy((f - 1) * 13 + b + 1)
        if (cur > prev) h |= 1L << ((f - 1) * 12 + b)
      }
      h
    }
    val fixtureLike = Array.tabulate(500)(i => ((i * 131 + 17) % 251).toByte)
    assert(AudioFingerprintKernel.hash(fixtureLike) == foldHash(fixtureLike))
    val tiny = Array[Byte](1, 2, 3)
    assert(AudioFingerprintKernel.hash(tiny) == foldHash(tiny))
  }

}

object AudioCodecSpec {
  /** WAV builders shared with MultimodalSpec's audio-branch test. */
  def wavBytes(samples: Array[Int], rate: Int, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort); buf.putInt(rate)
    buf.putInt(rate * channels * 2); buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }
}
