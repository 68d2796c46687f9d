package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.operators.Multimodal.MediaItem

/** The multimodal×dedup pairing: [[Multimodal.dHash64Of]]'s invariants
  * (rescale-stability, re-encode robustness) and the composition of image
  * hashes into the SAME banded-pair + keeper tail every text pair source
  * uses. Everything here is deterministic — the JDK's PNG/JPEG codecs are
  * pure functions of the pixels. */
class PerceptualHashSpec extends SparkSpec {

  /** A structured grayscale test card: middle-square mixed luma per cell
    * (the q121 fixture arithmetic), painted at `scale`× as constant
    * blocks. */
  private def card(seed: Long, scale: Int, perturb: Int = 0): BufferedImage = {
    val w = Multimodal.DHashCols * scale
    val h = Multimodal.DHashRows * scale
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val gx = x / scale; val gy = y / scale
      val sd = (seed * 131 + gx * 31 + gy * 17 + 7) % 65536
      val v = (((sd * sd / 256) % 256 +
        (if (perturb != 0 && (gx + gy) % 2 == 0) perturb else 0)) % 256).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** A smooth two-axis gradient — the JPEG-friendly shape (no hard edges,
    * so lossy re-encode moves cell means only slightly). */
  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 255) / (w - 1) + (y * 97) / (h - 1)) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def decode(bytes: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash is invariant under exact k× block upscale (any k)") {
    for (seed <- Seq(3L, 17L, 99L); k <- Seq(2, 3, 5)) {
      val base = Multimodal.dHash64Of(card(seed, 1))
      val up = Multimodal.dHash64Of(card(seed, k))
      assert(base === up, s"seed=$seed k=$k")
    }
  }

  test("dHash is invariant under nearest-neighbor rescale of a real raster") {
    // not just constant blocks: upscale via Graphics2D nearest-neighbor,
    // which replicates pixels — block means are preserved exactly
    val src = card(42L, 2)
    val big = new BufferedImage(src.getWidth * 3, src.getHeight * 3,
      BufferedImage.TYPE_INT_RGB)
    val g2 = big.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
    g2.drawImage(src, 0, 0, big.getWidth, big.getHeight, null)
    g2.dispose()
    assert(Multimodal.dHash64Of(src) === Multimodal.dHash64Of(big))
  }

  test("dHash survives PNG→JPEG re-encode within a small hamming budget") {
    val src = gradient(90, 80)
    val pngHash = Multimodal.dHash64Of(decode(encode(src, "png")))
    val jpgHash = Multimodal.dHash64Of(decode(encode(src, "jpg")))
    val d = hamming(pngHash, jpgHash)
    assert(d <= 6, s"JPEG re-encode moved the hash by $d bits")
    // and the PNG roundtrip is LOSSLESS — bit-identical
    assert(pngHash === Multimodal.dHash64Of(src))
  }

  test("unrelated structured images stay far apart") {
    val hs = Seq(1L, 2L, 3L, 4L, 5L).map(s => Multimodal.dHash64Of(card(s, 1)))
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 6, s"cards $i/$j too close")
  }

  test("decoded pixel features feed the ANN family: same-card variants rank first") {
    val s = spark; import s.implicits._
    // 6 cards × (original, 4× upscale): the multimodal×similarity pairing
    val items = (for (g <- 0 until 6; v <- Seq(1, 4)) yield
      MediaItem(g * 10L + v, "image", encode(card(g * 3 + 2, v), "png"),
        "image/png", s"g$g/s$v")).toDS()
    val feats = Multimodal.extractFeatures(items, new Multimodal.PixelDecoder())
      .toDF().select(col("item_id"),
        org.apache.spark.sql.functions.slice(col("feature"), 4,
          Multimodal.LumBins).as("feature"))
    val top1 = graft.operators.Similarity
      .bruteForceTopK(feats, "item_id", "feature", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (g <- 0 until 6) {
      assert(top1(g * 10L + 1) === g * 10L + 4,
        s"card $g's upscale must be its nearest neighbor")
      assert(top1(g * 10L + 4) === g * 10L + 1)
    }
  }

  test("hammingBandedPairsAgainst: batch screens against stored sigs — copies match, novel admit") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    val stored = (0 until 6).map(g =>
      (g * 10L, Multimodal.dHash64Of(card(g * 7 + 1, 1)))).toDF("id", "sig")
    val batch = (
      // a rescaled re-upload of card 2 (identical hash) + a perturbed
      // copy of card 3 + two novel cards
      Seq(900L -> Multimodal.dHash64Of(card(2 * 7 + 1, 3)),
        901L -> Multimodal.dHash64Of(card(3 * 7 + 1, 1, perturb = 1)),
        902L -> Multimodal.dHash64Of(card(77, 1)),
        903L -> Multimodal.dHash64Of(card(91, 1)))).toDF("id", "sig")
    val pairs = Dedup.hammingBandedPairsAgainst(batch, stored, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byBatch = pairs.groupBy(_._1)
    assert(byBatch(900L).exists(p => p._2 === 20L && p._3 === 0),
      "rescaled re-upload must match its stored original at hamming 0")
    assert(byBatch(901L).exists(p => p._2 === 30L && p._3 <= 6),
      "perturbed copy must match within the budget")
    assert(!byBatch.contains(902L) && !byBatch.contains(903L),
      "novel cards must have no stored match")
    scope.release()
  }

  test("videoNearDupPairs: frame-aligned vote — full-copy pairs survive, shared-intro clips don't") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    def fsig(g: Long, f: Int, scale: Int = 1, perturb: Int = 0): Long =
      Multimodal.dHash64Of(card(g * 101 + f * 57, scale, perturb))
    // 10 = original, 11 = re-encode (3× upscale — identical per-frame
    // hash), 12 = perturbed copy (within the per-frame budget), 13 = a
    // clip sharing only frames 0–1, 14 = unrelated content
    val rows = (0 until 6).flatMap { f =>
      Seq(
        (10L, f, fsig(1, f)),
        (11L, f, fsig(1, f, scale = 3)),
        (12L, f, fsig(1, f, perturb = 1)),
        (13L, f, if (f < 2) fsig(1, f) else fsig(40, f)),
        (14L, f, fsig(7, f)))
    }.toDF("id", "frame", "sig")
    val pairs = Dedup.videoNearDupPairs(rows, maxHamming = 6, minMatchingFrames = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ===
      Set((10L, 11L), (10L, 12L), (11L, 12L)),
      "exactly the three full-copy pairs must survive the 4-of-6 vote")
    assert(pairs.forall(_._3 === 6L), "full copies must match at every frame")
    scope.release()
  }

  test("videoContainmentPairs: the directed score catches the cut clip the vote misses") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    def fsig(g: Long, f: Int): Long = Multimodal.dHash64Of(card(g * 101 + f * 57, 1))
    val rows = (
      // 10 = a 6-frame original; 13 = a TRUE 2-frame clip of its frames
      // 2–3 stored at indices 0–1 (a cut breaks positional alignment);
      // 15 = equal-length partial overlap (frames 0–1 only); 14 = noise
      (0 until 6).map(f => (10L, f, fsig(1, f))) ++
      Seq((13L, 0, fsig(1, 2)), (13L, 1, fsig(1, 3))) ++
      (0 until 6).map(f => (15L, f, if (f < 2) fsig(1, f) else fsig(40, f))) ++
      (0 until 6).map(f => (14L, f, fsig(7, f)))).toDF("id", "frame", "sig")
    // the symmetric vote misses the clip (only 2 matching frames)...
    assert(!Dedup.videoNearDupPairs(rows, maxHamming = 6, minMatchingFrames = 4)
      .collect().exists(r => r.getLong(1) === 13L))
    // ...the directed containment catches it, index-independently
    val got = Dedup.videoContainmentPairs(rows, maxHamming = 6, minContainment = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((10L, 13L)),
      "exactly the (original, clip) pair — partial overlap and noise stay out")
    val p = got.head
    assert(p._3 === 6L && p._4 === 2L)
    assert(p._5 === 2.0 / 6 && p._6 === 1.0,
      "directed scores: 2/6 on the source side, 1.0 on the clip side")
    scope.release()
  }

  test("videoContainmentAgainst: contained arrivals reject, partial overlap admits") {
    val s = spark; import s.implicits._
    implicit val scope: graft.operators.CacheScope = new graft.operators.CacheScope
    def fsig(g: Long, f: Int, perturb: Int = 0): Long =
      Multimodal.dHash64Of(card(g * 101 + f * 57, 1, perturb))
    val stored = (0 until 6).flatMap(f =>
      Seq((10L, f, fsig(1, f)), (20L, f, fsig(7, f)))).toDF("id", "frame", "sig")
    val batch = (
      // 100: perturbed full copy of 10 — contained, reject
      (0 until 6).map(f => (100L, f, fsig(1, f, perturb = 1))) ++
      // 101: a 2-frame cut of 10's frames 3-4 stored at indices 0-1 —
      // contained, reject (index-independent)
      Seq((101L, 0, fsig(1, 3)), (101L, 1, fsig(1, 4))) ++
      // 102: partial overlap — 2 of 6 frames shared, 4 new — ADMIT
      (0 until 6).map(f => (102L, f, if (f < 2) fsig(1, f) else fsig(55, f))) ++
      // 103: novel — admit
      (0 until 6).map(f => (103L, f, fsig(77, f)))).toDF("id", "frame", "sig")
    val got = Dedup.videoContainmentAgainst(batch, stored,
        maxHamming = 6, minContainment = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.map(_._1).toSet === Set(100L, 101L),
      "exactly the contained arrivals match; overlap and novel admit")
    assert(got.forall(p => p._2 === 10L && p._3 === 1.0))
    scope.release()
  }

  test("dHashes → hammingBandedPairs → nearDedupKeepBest: the image dedup tail") {
    val s = spark; import s.implicits._
    // 4 groups × (original PNG, JPEG re-encode of a gradient variant,
    // 2× upscale) + 2 singletons; quality = payload size (keep the
    // largest encoding per cluster)
    val items = (for (g <- 0 until 4; v <- 0 until 3) yield {
      val img = v match {
        case 0 => card(g * 7 + 1, 1)
        case 1 => card(g * 7 + 1, 1, perturb = 1)
        case 2 => card(g * 7 + 1, 4)
      }
      MediaItem(g * 10L + v, "image", encode(img, "png"), "image/png", s"g$g/v$v")
    }) ++ Seq(
      MediaItem(900L, "image", encode(gradient(45, 40), "png"), "image/png", "lone1"),
      // a non-image payload must be dropped, not fail the task
      MediaItem(901L, "image", Array[Byte](1, 2, 3), "image/png", "junk"))
    val ds = items.toDS()

    val hashes = Multimodal.dHashes(ds)
    val hm = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!hm.contains(901L), "undecodable payload must drop out")
    assert(hm.contains(900L))
    for (g <- 0 until 4) {
      assert(hm(g * 10L) === hm(g * 10L + 2), "upscale must hash identically")
      assert(hamming(hm(g * 10L), hm(g * 10L + 1)) <= 6, "perturbed copy too far")
    }

    val pairs = Dedup.hammingBandedPairs(
      hashes.select(col("item_id").as("id"), col("dhash").as("sig")),
      maxHamming = 6)
    val meta = ds.toDF().select(col("item_id"),
      length(col("content")).cast("double").as("n_bytes"))
    val kept = Dedup.nearDedupKeepBest(meta, "item_id", "n_bytes", pairs)
      .select("item_id").as[Long].collect().toSet

    // one keeper per group + the two singletons (undecodable item has no
    // hash → never paired → survives untouched)
    assert(kept.size === 6, s"kept=$kept")
    assert(kept.contains(900L) && kept.contains(901L))
    for (g <- 0 until 4) {
      val members = Set(g * 10L, g * 10L + 1, g * 10L + 2)
      val winner = kept.intersect(members)
      assert(winner.size === 1, s"group $g kept $winner")
      // keeper is the argmax payload size within the cluster
      val sizes = items.filter(i => members.contains(i.item_id))
        .map(i => i.item_id -> i.content.length).toMap
      assert(sizes(winner.head) === sizes.values.max)
    }
  }
}
