package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.operators.Multimodal.MediaItem

/** The multimodal×dedup pairing for AUDIO: [[Multimodal.wavPcm16Mono]] is a
  * REAL RIFF/PCM byte-walking parse (exercised round-trip here), and
  * [[Multimodal.audioFp64Of]]'s invariants (gain, block resample) are exact
  * integer facts — every test is deterministic. */
class AudioFingerprintSpec extends SparkSpec {

  /** The q132 synthesis arithmetic: middle-square mixed sample values. */
  private def synth(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      val sd = (seed * 131 + i * 17 + 7) % 65536
      ((sd * sd / 256) % 256).toInt
    }

  private def wavBytes(rate: Int, samples: Array[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
    tag("RIFF"); le32(36 + 2 * samples.length); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(1); le32(rate); le32(rate * 2)
    le16(2); le16(16)
    tag("data"); le32(2 * samples.length)
    samples.foreach(le16)
    bos.toByteArray
  }

  private val N = Multimodal.AfpWindows * 16 // 1040: exact window blocks

  test("wavPcm16Mono round-trips the RIFF encoding, including negative samples") {
    val samples = Array(0, 1, -1, 32767, -32768, 123, -456) ++ synth(5, 100)
    val parsed = Multimodal.wavPcm16Mono(wavBytes(8000, samples))
    assert(parsed.isDefined)
    val (rate, out) = parsed.get
    assert(rate === 8000)
    assert(out.toSeq === samples.toSeq)
  }

  test("wavPcm16Mono rejects what it can't decode, row-wise") {
    assert(Multimodal.wavPcm16Mono(Array.fill[Byte](10)(1)).isEmpty, "too short")
    assert(Multimodal.wavPcm16Mono("not audio at all, just bytes".getBytes ++
      new Array[Byte](40)).isEmpty, "no RIFF magic")
    // stereo: flip the channel count in an otherwise valid header
    val stereo = wavBytes(8000, synth(1, 100))
    stereo(22) = 2
    assert(Multimodal.wavPcm16Mono(stereo).isEmpty, "strict mono contract")
  }

  test("fingerprint is exactly gain-invariant") {
    for (seed <- Seq(3L, 17L, 99L); k <- Seq(2, 5, 30)) {
      val base = synth(seed, N)
      assert(Multimodal.audioFp64Of(base) ===
        Multimodal.audioFp64Of(base.map(_ * k)),
        s"gain x$k must not move a single bit (seed $seed)")
    }
  }

  test("fingerprint is exactly invariant under k-times block upsampling") {
    for (seed <- Seq(3L, 17L, 99L); k <- Seq(2, 3, 5)) {
      val base = synth(seed, N)
      val up = base.flatMap(s => Array.fill(k)(s))
      assert(Multimodal.audioFp64Of(base) === Multimodal.audioFp64Of(up),
        s"block upsample x$k must not move a single bit (seed $seed)")
    }
  }

  test("perturbed copies stay within the budget; unrelated clips stay far apart") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (seed <- Seq(3L, 17L, 99L, 4242L)) {
      val base = synth(seed, N)
      val perturbed = base.zipWithIndex.map { case (s, i) =>
        if ((i / 16) % 2 == 0) s + 1 else s
      }
      val d = hamming(Multimodal.audioFp64Of(base), Multimodal.audioFp64Of(perturbed))
      assert(d <= 6, s"+1-on-even-windows must stay within the band budget, got $d")
    }
    for (a <- Seq(3L, 17L); b <- Seq(99L, 4242L)) {
      val d = hamming(
        Multimodal.audioFp64Of(synth(a, N)), Multimodal.audioFp64Of(synth(b, N)))
      assert(d > 6, s"unrelated clips ($a vs $b) must not pair, got hamming $d")
    }
  }

  // ------------------------------------------------- spectral fingerprint

  // truncating division, the q135 fixture's exact arithmetic (JVM `/`
  // truncates toward zero like DuckDB `//`)
  private def eqShelf(x: Array[Int]): Array[Int] =
    Array.tabulate(x.length)(i =>
      if (i == 0) x(0) else x(i) + (x(i) - x(i - 1)) / 4)

  private def nyquistFlip(x: Array[Int]): Array[Int] =
    Array.tabulate(x.length)(i => if (i % 2 == 1) -x(i) else x(i))

  test("spectral fingerprint is exactly gain-invariant") {
    for (seed <- Seq(3L, 17L, 99L); k <- Seq(2, 7, 30)) {
      val base = synth(seed, N)
      assert(Multimodal.spectralFp64Of(base) ===
        Multimodal.spectralFp64Of(base.map(_ * k)),
        s"gain x$k must not move a single bit (seed $seed)")
    }
  }

  test("spectral separates EQ'd copies from envelope-coincidental clips — the contour's blind spot") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val seeds = (0 until 12).map(k => k * 104729L + 31L)
    for (seed <- seeds) {
      val base = synth(seed, N)
      val eq = eqShelf(base)
      val flip = nyquistFlip(base)
      // the CONTOUR hash cannot see the flip: |samples| identical
      assert(Multimodal.audioFp64Of(base) === Multimodal.audioFp64Of(flip),
        "envelope hash collides on the Nyquist flip — by construction")
      // the SPECTRAL hash keeps the EQ'd copy and rejects the flip
      val sBase = Multimodal.spectralFp64Of(base)
      assert(hamming(sBase, Multimodal.spectralFp64Of(eq)) <= 7,
        s"mild treble shelf must stay within the budget (seed $seed)")
      assert(hamming(sBase, Multimodal.spectralFp64Of(flip)) > 7,
        s"spectrally-opposite clip must not pair (seed $seed)")
    }
    for (a <- Seq(31L, 104760L); b <- Seq(209489L, 314218L)) {
      val d = hamming(Multimodal.spectralFp64Of(synth(a, N)),
        Multimodal.spectralFp64Of(synth(b, N)))
      assert(d > 7, s"unrelated clips ($a vs $b) must not pair, got $d")
    }
  }

  test("spectralFingerprints: real WAV parse feeds the hash; hostile items drop row-wise") {
    val s = spark; import s.implicits._
    val items = (0 until 3).flatMap { g =>
      val base = synth(g * 7 + 1, N)
      Seq(
        MediaItem(g * 10L, "audio", wavBytes(8000, base), "audio/wav", s"s$g/0"),
        MediaItem(g * 10L + 1, "audio", wavBytes(8000, eqShelf(base)),
          "audio/wav", s"s$g/1"),
        MediaItem(g * 10L + 2, "audio", Array.fill[Byte](12)(3), "audio/wav", s"s$g/x"))
    }.toDS()
    val fps = Multimodal.spectralFingerprints(items)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps.size === 6, "hostile items drop row-wise")
    for (g <- 0 until 3)
      assert(fps(g * 10L) === Multimodal.spectralFp64Of(synth(g * 7 + 1, N)),
        "the parsed samples hash identically to the source samples")
  }

  test("audioFingerprints → hammingBandedPairs: copies cluster through the shared tail") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val items = (0 until 4).flatMap { g =>
      val base = synth(g * 7 + 1, N)
      Seq(
        MediaItem(g * 10L, "audio", wavBytes(8000, base), "audio/wav", s"a$g/0"),
        MediaItem(g * 10L + 1, "audio",
          wavBytes(24000, base.flatMap(v => Array.fill(3)(v))), "audio/wav", s"a$g/1"),
        MediaItem(g * 10L + 2, "audio",
          wavBytes(8000, base.map(_ * 2)), "audio/wav", s"a$g/2"),
        // a corrupt payload: must drop row-wise, not fail the task
        MediaItem(g * 10L + 3, "audio", Array.fill[Byte](16)(7), "audio/wav", s"a$g/x"),
        // a VALID WAV too short for the 65-window contour (audioFp64Of
        // would throw): must also drop row-wise (ADVICE r14)
        MediaItem(g * 10L + 4, "audio", wavBytes(8000, synth(g, 10)),
          "audio/wav", s"a$g/s"))
    }.toDS()
    val fps = Multimodal.audioFingerprints(items)
    assert(fps.count() === 12, "corrupt and too-short items drop row-wise")
    val pairs = Dedup.hammingBandedPairs(
      fps.select(col("item_id").as("id"), col("afp").as("sig")), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 4).flatMap { g =>
      Seq((g * 10L, g * 10L + 1), (g * 10L, g * 10L + 2), (g * 10L + 1, g * 10L + 2))
    }.toSet
    assert(pairs === expected, "each group's three encodings pair; nothing crosses groups")
    scope.release()
  }
}
