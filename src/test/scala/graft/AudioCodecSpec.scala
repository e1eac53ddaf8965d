package graft

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.CompressedAudio

/** G.711 compressed-audio codec: the m03 oracle's SQL replays the
  * PUBLISHED µ-law/A-law expansion formulas, so this spec pins the JDK's
  * ULAW/ALAW converters to those formulas over the full 256-value byte
  * domain — if a JDK ever shipped a different table, the pin fails here,
  * not as an opaque oracle hash mismatch. */
class AudioCodecSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Published G.711 µ-law expansion (ITU-T G.711, the Sun/CCITT form). */
  private def g711u(b: Int): Int = {
    val u = ~b & 0xff
    val sample = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    if ((u & 0x80) != 0) -sample else sample
  }

  /** Published G.711 A-law expansion (sign bit CLEAR means negative). */
  private def g711a(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val e = (a >> 4) & 0x07
    val mag =
      if (e == 0) ((a & 0x0f) << 4) + 8
      else (((a & 0x0f) << 4) + 0x108) << (e - 1)
    if ((a & 0x80) == 0) -mag else mag
  }

  private def jdkDecodeAll(enc: AudioFormat.Encoding): Array[Int] = {
    val srcFmt = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val bytes = Array.tabulate[Byte](256)(i => i.toByte)
    val src = new AudioInputStream(new ByteArrayInputStream(bytes), srcFmt, 256)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val out = AudioSystem.getAudioInputStream(pcmFmt, src).readAllBytes()
    Array.tabulate(256)(i => ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt)
  }

  test("JDK ULAW converter equals the published G.711 formula on all 256 bytes") {
    val jdk = jdkDecodeAll(AudioFormat.Encoding.ULAW)
    for (b <- 0 until 256) assert(jdk(b) == g711u(b), s"byte $b")
  }

  test("JDK ALAW converter equals the published G.711 formula on all 256 bytes") {
    val jdk = jdkDecodeAll(AudioFormat.Encoding.ALAW)
    for (b <- 0 until 256) assert(jdk(b) == g711a(b), s"byte $b")
  }

  test("render -> decode round-trips exact PCM stats for both laws") {
    for (aLaw <- Seq(false, true); seed <- Seq(0L, 7L, 255L, 100000L)) {
      val ns = 75
      val wav = CompressedAudio.renderG711Wav(seed, ns, 8000, aLaw)
      val got = CompressedAudio.decode(42L, wav)
        .getOrElse(fail(s"undecodable (aLaw=$aLaw seed=$seed)"))
      val expand: Int => Int = if (aLaw) g711a else g711u
      val pcm = (0 until ns).map(i => expand(((5L * i + seed) % 256).toInt))
      assert(got.encoding == (if (aLaw) "alaw" else "ulaw"))
      assert(got.sample_rate == 8000 && got.n_samples == ns)
      assert(got.sum_pcm == pcm.map(_.toLong).sum)
      assert(got.min_pcm == pcm.min && got.max_pcm == pcm.max)
    }
  }

  test("hostile bytes route to None, never fail") {
    val rnd = new scala.util.Random(7)
    val garbage = Array.fill(512)(rnd.nextInt.toByte)
    assert(CompressedAudio.decode(1L, garbage).isEmpty)
    assert(CompressedAudio.decode(2L, Array.emptyByteArray).isEmpty)
    val truncated = CompressedAudio.renderG711Wav(1L, 50, 8000, aLaw = false).take(30)
    assert(CompressedAudio.decode(3L, truncated).isEmpty)
    // a PCM WAV is valid audio but not this stage's codec: routed, not decoded
    val pcmWav = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      out.write("RIFF".getBytes); w32(36 + 4); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
      out.write("data".getBytes); w32(4); w16(100); w16(-100 & 0xffff)
      out.toByteArray
    }
    assert(CompressedAudio.decode(4L, pcmWav).isEmpty)
  }

  test("fast table path agrees with the JDK path on clean, mutated and fuzzed streams") {
    // clean streams, both laws, even/odd/short lengths
    for (aLaw <- Seq(false, true); seed <- 0L until 40L; ns <- Seq(1, 2, 15, 16, 17, 50, 75)) {
      val wav = CompressedAudio.renderG711Wav(seed, ns, 8000, aLaw)
      assert(CompressedAudio.decode(1L, wav) == CompressedAudio.decodeJdk(1L, wav),
        s"decode aLaw=$aLaw seed=$seed ns=$ns")
      assert(CompressedAudio.fingerprint(1L, wav) == CompressedAudio.fingerprintJdk(1L, wav),
        s"fingerprint aLaw=$aLaw seed=$seed ns=$ns")
    }
    // single-byte mutations of a valid stream: every container field gets
    // hit, so the strict walker's fall-back boundary is exercised — the
    // JDK path remains the arbiter on every byte
    val base = CompressedAudio.renderG711Wav(11L, 60, 8000, aLaw = false)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      assert(CompressedAudio.decode(1L, m) == CompressedAudio.decodeJdk(1L, m))
    }
    // truncations (both chunk-aligned and mid-chunk)
    for (k <- 0 to base.length)
      assert(CompressedAudio.decode(1L, base.take(k)) == CompressedAudio.decodeJdk(1L, base.take(k)))
    // chunk-ORDER adversary: a [data][fmt] layout is JDK-rejected (the
    // reader searches for data only after fmt) — the fast walker must
    // fall back, not accept what the codec of record won't
    val reordered = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      out.write("RIFF".getBytes); w32(4 + 12 + 26); out.write("WAVE".getBytes)
      out.write("data".getBytes); w32(4); out.write(Array[Byte](1, 2, 3, 4))
      out.write("fmt ".getBytes); w32(18); w16(7); w16(1); w32(8000); w32(8000)
      w16(1); w16(8); w16(0)
      out.toByteArray
    }
    assert(CompressedAudio.decode(1L, reordered) == CompressedAudio.decodeJdk(1L, reordered))
    assert(CompressedAudio.decode(1L, reordered).isEmpty,
      "JDK rejects data-before-fmt; the fast path must not accept it")
    // WAVE-magic-biased fuzz so the RIFF walk is fuzzed PAST the guard
    for (i <- 0 until 200) {
      val g = Array.fill(80 + rnd.nextInt(100))(rnd.nextInt().toByte)
      System.arraycopy("RIFF".getBytes, 0, g, 0, 4)
      System.arraycopy("WAVE".getBytes, 0, g, 8, 4)
      if (i % 2 == 0) System.arraycopy("fmt ".getBytes, 0, g, 12, 4)
      assert(CompressedAudio.decode(1L, g) == CompressedAudio.decodeJdk(1L, g))
    }
  }

  test("m03 decode stage runs distributed over payload partitions") {
    import spark.implicits._
    val payloads = Seq(
      (1L, CompressedAudio.renderG711Wav(3L, 30, 8000, aLaw = false)),
      (2L, CompressedAudio.renderG711Wav(9L, 40, 8000, aLaw = true)),
      (3L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val got = graft.multimodal.Multimodal.decodeG711Partitions(payloads, spark)
      .collect().map(d => d.doc_id -> d.encoding).toMap
    assert(got == Map(1L -> "ulaw", 2L -> "alaw"))
  }
}
