package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-item decode /
  * feature-extract runs as a partition-local pipeline (the Scala analog of
  * `mapInPandas` batching: one decoder instantiation per partition, rows
  * streamed through it).
  *
  * Decode depth is tiered, all pure JVM (no codec jars in this container):
  * [[PixelDecoder]] does REAL raster decode for PNG/JPEG/GIF/BMP via JDK
  * ImageIO (channel means + luminance histogram); [[HeaderDecoder]] parses
  * real container headers (PNG/JPEG/GIF dims, WAV duration) without
  * decoding; [[StubDecoder]] is the deterministic last-resort fake —
  * byte-derived pseudo-dimensions and a seeded feature vector — so video/
  * audio sample work (no JDK codec) still exercises real Spark plumbing
  * (schema, encoders, partitioning, batch shape), and a codec-backed
  * decoder drops in behind the same trait.
  *
  * Scale: decode is embarrassingly parallel — a narrow `mapPartitions`
  * directly over the file scan, no shuffle. Payload bytes never hit the
  * driver; `spark.read.format("binaryFile")` splits by file and the
  * metadata-only projections prune the content column at the parquet/scan
  * level when downstream queries don't touch the bytes.
  */
object Multimodal {

  /** A media item: opaque payload + typed metadata. */
  final case class MediaItem(
      item_id: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      mime: String,
      source: String)

  /** Decoded per-item features (dimensions are modality-dependent). */
  final case class MediaFeatures(
      item_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int, // image/video; -1 otherwise
      height: Int, // image/video; -1 otherwise
      duration_ms: Long, // audio/video; -1 otherwise
      feature: Array[Float])

  /** One decoder instance per partition; must be cheap to construct or do
    * its heavy init lazily. */
  trait Decoder extends Serializable {
    def decode(item: MediaItem): MediaFeatures

    /** Duration in ms WITHOUT a full decode — real containers carry it in
      * the header (MP4 mvhd, WAV fmt), so probing is an O(KB) read while
      * decode is O(payload). [[sampleFrames]] calls this, not [[decode]]:
      * with a codec-backed decoder the probe-then-sample path would
      * otherwise decode every video twice. Default falls back to the full
      * decode for decoders that can't probe. */
    def probeDuration(item: MediaItem): Long = decode(item).duration_ms
  }

  /** Deterministic fake standing in for the real codecs (no image/audio
    * libs in this container). Dimensions are md5-derived pure functions of
    * the payload bytes, chosen so an external SQL oracle can recompute them
    * (`CAST('0x' || substring(md5(payload), …) AS BIGINT)`) — tests AND the
    * driver's correctness gate can verify the plumbing end-to-end. */
  final class StubDecoder(featureDim: Int = 16) extends Decoder {
    // two independent 24-bit words of the payload digest — non-negative,
    // exact in any integer SQL dialect
    private def digestWords(bytes: Array[Byte]): (Long, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 6), 16),
        java.lang.Long.parseLong(hex.substring(6, 12), 16))
    }

    /** Header-probe stand-in: the duration decode() would report, without
      * building dimensions or the feature vector. */
    override def probeDuration(item: MediaItem): Long =
      if (item.kind == "audio" || item.kind == "video") {
        val (h1, h2) = digestWords(item.content)
        100L + (h1 * 4096L + h2) % 60000L
      } else -1L

    override def decode(item: MediaItem): MediaFeatures = {
      val bytes = item.content
      val (h1, h2) = digestWords(bytes)
      val isVisual = item.kind == "image" || item.kind == "video"
      val isTimed = item.kind == "audio" || item.kind == "video"
      MediaFeatures(
        item_id = item.item_id,
        kind = item.kind,
        n_bytes = bytes.length.toLong,
        width = if (isVisual) (64 + h1 % 1024).toInt else -1,
        height = if (isVisual) (64 + h2 % 1024).toInt else -1,
        duration_ms = if (isTimed) 100L + (h1 * 4096L + h2) % 60000L else -1L,
        feature = Array.tabulate(featureDim) { i =>
          // seeded, digest-derived pseudo-feature in (-1, 1)
          val x = (h1 * 2654435761L + h2 * 97L + i * 40503L)
          ((x % 100000L) / 100000.0f)
        })
    }
  }

  /** Real container-header decode (pure JVM, no codec jars — see
    * [[MediaHeaders]]): PNG/JPEG/GIF dimensions and WAV duration are parsed
    * from the payload's actual header bytes; items whose bytes are none of
    * those formats (or whose modality has no parser — video containers,
    * pixel features) fall back to `fallback`, the [[StubDecoder]] by
    * default. Width/height/duration are thus REAL for the most common
    * formats while feature extraction stays stubbed — a codec-backed
    * decoder replaces only the fallback. */
  final class HeaderDecoder(fallback: Decoder = new StubDecoder()) extends Decoder {
    override def probeDuration(item: MediaItem): Long =
      if (item.kind == "audio" || item.kind == "video")
        MediaHeaders.wavDurationMs(item.content)
          .orElse(MediaHeaders.mp4DurationMs(item.content))
          .getOrElse(fallback.probeDuration(item))
      else -1L

    override def decode(item: MediaItem): MediaFeatures = {
      val base = fallback.decode(item)
      val dims =
        if (item.kind == "image" || item.kind == "video")
          MediaHeaders.imageDims(item.content)
        else None
      val dur =
        if (item.kind == "audio" || item.kind == "video")
          MediaHeaders.wavDurationMs(item.content)
            .orElse(MediaHeaders.mp4DurationMs(item.content))
        else None
      if (dims.isEmpty && dur.isEmpty) base
      else base.copy(
        width = dims.map(_._1).getOrElse(base.width),
        height = dims.map(_._2).getOrElse(base.height),
        duration_ms = dur.getOrElse(base.duration_ms))
    }
  }

  /** Number of luminance histogram bins [[PixelDecoder]] emits after the
    * three channel means — feature layout `[rMean, gMean, bMean, h0..h7]`. */
  val LumBins = 8

  /** REAL pixel-level decode for the formats the JDK ships codecs for
    * (ImageIO: PNG/JPEG/GIF/BMP — no external jars, same public-knowledge
    * footing as the header parsers). Content features are computed from
    * the actual decoded raster:
    *
    *  - `width`/`height` from the decoded image (stronger than the header
    *    probe — it survives formats whose header lies),
    *  - `feature(0..2)` = mean R, G, B channel values (0–255),
    *  - `feature(3..10)` = [[LumBins]]-bin histogram of Rec.601 luma
    *    (`0.299R + 0.587G + 0.114B`, bin width 32), as fractions summing
    *    to 1.
    *
    * Items ImageIO can't decode — video containers, audio, truncated or
    * foreign bytes (the normal case in a dirty corpus) — fall back to
    * `fallback` per item, never fail the task. Decode is partition-local
    * like every other decoder; payload bytes never leave the executor. */
  final class PixelDecoder(fallback: Decoder = new HeaderDecoder()) extends Decoder {
    override def probeDuration(item: MediaItem): Long = fallback.probeDuration(item)

    override def decode(item: MediaItem): MediaFeatures = {
      val img =
        if (item.kind != "image") None
        else
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(item.content)))
          catch { case _: Exception => None } // malformed → per-item fallback
      img match {
        case None => fallback.decode(item)
        case Some(im) =>
          val w = im.getWidth
          val h = im.getHeight
          var rSum = 0.0
          var gSum = 0.0
          var bSum = 0.0
          val hist = new Array[Long](LumBins)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            im.getRGB(0, y, w, 1, row, 0, w) // bulk row read beats per-pixel getRGB
            var x = 0
            while (x < w) {
              val rgb = row(x)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              rSum += r; gSum += g; bSum += b
              val lum = 0.299 * r + 0.587 * g + 0.114 * b
              hist(math.min(LumBins - 1, (lum / 32.0).toInt)) += 1
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          MediaFeatures(
            item_id = item.item_id,
            kind = item.kind,
            n_bytes = item.content.length.toLong,
            width = w,
            height = h,
            duration_ms = -1L,
            feature = Array((rSum / n).toFloat, (gSum / n).toFloat, (bSum / n).toFloat) ++
              hist.map(c => (c.toDouble / n).toFloat))
      }
    }
  }

  /** dHash grid geometry: 9×8 luma cells → 8×8 horizontal-gradient bits
    * (the classic difference-hash layout). */
  val DHashCols = 9
  val DHashRows = 8

  /** 64-bit perceptual difference hash of a decoded raster — EXACT integer
    * arithmetic so an external SQL oracle can replay it bit-for-bit:
    *
    *  1. partition the image into a [[DHashCols]]×[[DHashRows]] grid of
    *     cells (cell (gx,gy) spans pixel columns [gx·W/9, (gx+1)·W/9) ×
    *     rows [gy·H/8, (gy+1)·H/8), floor arithmetic — exact equal blocks
    *     when W,H are multiples of 9,8);
    *  2. per cell, sum integer Rec.601 luma ×1000 (299R + 587G + 114B) —
    *     no floating point anywhere;
    *  3. bit (gy·8 + gx) = 1 iff cell (gx,gy)'s MEAN luma < cell
    *     (gx+1,gy)'s, compared exactly by cross-multiplying the sums with
    *     the cell pixel counts.
    *
    * Robustness comes from the downsample: any k× rescale that preserves
    * block means (and, approximately, any resampling or mild re-encode)
    * maps to the same grid, so copies land within a small Hamming
    * distance — the property the banded pair join exploits. */
  def dHash64Of(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    // exactness bound: the cross-multiplied compare below is
    // sum(≤255000·cellPixels) × count(≤cellPixels) with cellPixels ≈
    // pixels/72 — past ~4×10⁸ total pixels the product can exceed
    // Long.MaxValue and silently corrupt the signature, so fail loudly
    // instead ([[dHashes]] drops such items row-wise). No real ImageIO
    // raster approaches this (a 0.4-gigapixel image needs a ~1.6 GB
    // int raster), so the guard documents the limit rather than costing
    // anything in practice.
    require(w.toLong * h <= 400000000L,
      s"dHash64Of exact-arithmetic bound exceeded: ${w}x$h pixels")
    val sums = Array.ofDim[Long](DHashCols, DHashRows)
    val counts = Array.ofDim[Long](DHashCols, DHashRows)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      im.getRGB(0, y, w, 1, row, 0, w)
      val gy = y * DHashRows / h
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum1000 = 299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        val gx = x * DHashCols / w
        sums(gx)(gy) += lum1000
        counts(gx)(gy) += 1L
        x += 1
      }
      y += 1
    }
    var sig = 0L
    var gy = 0
    while (gy < DHashRows) {
      var gx = 0
      while (gx < DHashCols - 1) {
        // mean(gx) < mean(gx+1), exact: sum_a/n_a < sum_b/n_b ⇔
        // sum_a·n_b < sum_b·n_a (counts are positive for any W,H ≥ grid)
        if (sums(gx)(gy) * counts(gx + 1)(gy) <
            sums(gx + 1)(gy) * counts(gx)(gy))
          sig |= 1L << (gy * (DHashCols - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    sig
  }

  /** Per-item perceptual hash over REAL decoded rasters: ImageIO decode
    * (PNG/JPEG/GIF/BMP) on the executors, [[dHash64Of]] over the pixels —
    * partition-local like every decoder, payload bytes never move. Items
    * that aren't images or fail to decode are dropped (a dirty corpus is
    * the normal case; they can't carry a pixel hash).
    *
    * @return (item_id, dhash) — feed
    *         `select(item_id as id, dhash as sig)` into
    *         [[Dedup.hammingBandedPairs]] for the near-dup pair list, then
    *         [[Dedup.nearDedupFromPairs]] / [[Dedup.nearDedupKeepBest]]
    *         for the keeper pass: image dedup composes into the SAME tail
    *         as every text pair source. */
  def dHashes(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { item =>
        if (item.kind != "image") None
        else {
          // decode AND hash under the try: the hash's exact-arithmetic
          // bound (gigapixel rasters) must drop row-wise like a failed
          // decode, never fail the task
          try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(item.content)))
            .map(im => (item.item_id, dHash64Of(im)))
          catch { case _: Exception => None }
        }
      }
    }.toDF("item_id", "dhash")
  }

  /** RIFF/WAVE PCM parse — a REAL audio decode, pure JVM byte-walking (no
    * codec library): chunk scan for `fmt ` + `data`, strict 16-bit mono
    * PCM (format tag 1), samples sign-extended from little-endian. Items
    * any stricter than that (compressed, stereo, 8/24-bit) return None —
    * the same row-wise degradation contract as the image decoders.
    *
    * @return (sampleRate, samples) */
  def wavPcm16Mono(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // chunk offsets walked in Long: near-2GB inputs can push
    // off + 8 + sz past Int.MaxValue, and Int wraparound would turn a
    // corrupt size field into a negative offset that passes the bound
    // check and throws out of the accessors instead of returning None
    var off = 12L
    var fmtOk = false; var rate = 0; var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val o = off.toInt // off + 8 <= length ⇒ fits in Int
      val id = tag(o); val sz = le32(o + 4)
      if (sz < 0 || sz > bytes.length) return None // hostile/corrupt size field
      if (id == "fmt " && off + 8 + 16 <= bytes.length) {
        fmtOk = le16(o + 8) == 1 && le16(o + 10) == 1 && le16(o + 22) == 16
        rate = le32(o + 12)
      } else if (id == "data") { dataOff = o + 8; dataLen = sz }
      off += 8L + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || dataOff.toLong + dataLen > bytes.length) None
    else {
      val n = dataLen / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = (le16(dataOff + 2 * i) << 16) >> 16; i += 1 }
      Some((rate, out))
    }
  }

  /** Audio fingerprint geometry: 65 equal-duration energy windows → 64
    * adjacent-comparison bits (the 1-D analogue of the dHash grid). */
  val AfpWindows = 65

  /** 64-bit audio fingerprint — the energy-contour difference hash: the
    * clip is partitioned into [[AfpWindows]] equal-duration windows
    * (sample i → window i·65/n, floor — exact equal blocks when 65 | n),
    * per-window mean |amplitude| is compared to its right neighbour by
    * exact cross-multiplication, bit w = 1 iff window w's mean < window
    * w+1's. Invariances, both EXACT in integer arithmetic:
    *
    *  - GAIN: scaling every sample by a positive constant scales both
    *    sides of each comparison equally (the brightness analogue);
    *  - RESAMPLE: k× block upsampling multiplies each window's sum and
    *    count by k when 65 | n (and approximately otherwise), so a
    *    re-encoded copy at a different sample rate lands within a small
    *    hamming distance — the property the banded pair join exploits. */
  def audioFp64Of(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= AfpWindows, s"need at least $AfpWindows samples, got $n")
    val sums = new Array[Long](AfpWindows)
    val counts = new Array[Long](AfpWindows)
    var i = 0
    while (i < n) {
      val w = ((i.toLong * AfpWindows) / n).toInt
      sums(w) += math.abs(samples(i).toLong)
      counts(w) += 1L
      i += 1
    }
    var sig = 0L
    var w = 0
    while (w < AfpWindows - 1) {
      // mean(w) < mean(w+1), exact by cross-multiplication (counts > 0
      // because n >= AfpWindows makes every floor-partition cell non-empty)
      if (sums(w) * counts(w + 1) < sums(w + 1) * counts(w))
        sig |= 1L << w
      w += 1
    }
    sig
  }

  /** Per-item audio fingerprint over REAL parsed WAV PCM: [[wavPcm16Mono]]
    * on the executors, [[audioFp64Of]] over the samples — partition-local,
    * payload bytes never move; non-audio / unparseable items drop row-wise.
    *
    * @return (item_id, afp) — feed `select(item_id as id, afp as sig)`
    *         into [[Dedup.hammingBandedPairs]] (near-dup pairs),
    *         [[Dedup.hammingBandedPairsAgainst]] (admission screen) or the
    *         keeper tail: audio dedup composes into the SAME machinery as
    *         the image and text signature families. */
  def audioFingerprints(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { item =>
        if (item.kind != "audio") None
        else
          // parse + hash under the try, and clips shorter than the window
          // count (which audioFp64Of rejects loudly) filter out first:
          // a valid-but-tiny or hostile WAV drops row-wise, never fails
          // the task — the same contract as the image decoders
          try wavPcm16Mono(item.content)
            .filter(_._2.length >= AfpWindows)
            .map { case (_, s) => (item.item_id, audioFp64Of(s)) }
          catch { case _: Exception => None }
      }
    }.toDF("item_id", "afp")
  }

  /** Spectral fingerprint geometry: 17 time windows × 5 lag-difference
    * bands → 16 × 4 = 64 double-difference bits. */
  val SfpWindows = 17
  val SfpLags: Array[Int] = Array(1, 3, 5, 9, 17)

  /** 64-bit SPECTRAL audio fingerprint — the banded time×frequency
    * difference hash of Haitsma & Kalker (2002), with the filterbank
    * realized as exact-integer LAG-DIFFERENCE energies so the whole chain
    * replays in SQL (no FFT, no floats): band b's energy in time window t
    * is Σ |x[i] − x[i − lag_b]| over the window (odd lags 1,3,5,9,17 —
    * odd so a Nyquist flip (−1)^i·x[i] moves EVERY band: an even lag
    * compares same-parity samples, so the flip cancels and the band is
    * flip-blind, defeating this feature's stated contrast with
    * [[audioFp64Of]]; each lag-k comb attenuates frequencies near
    * multiples of rate/k, so the five energies summarize the spectrum
    * coarsely), and
    * bit (t−1)·4 + b = 1 iff the TIME-then-FREQUENCY double difference
    * (E(t,b) − E(t,b+1)) − (E(t−1,b) − E(t−1,b+1)) is positive — the H&K
    * bit rule, whose sign survives mild EQ because a shelf scales
    * adjacent bands nearly equally while the double difference tracks
    * CHANGES across time.
    *
    * What this adds over [[audioFp64Of]]: the energy contour is blind to
    * frequency content — two different clips with the same loudness
    * envelope (e.g. a Nyquist-flipped copy, (−1)^i·x[i], whose |samples|
    * are IDENTICAL) collide there, and an EQ'd re-encode drifts. Here
    * the lag filterbank separates them. GAIN stays exactly invariant
    * (every energy scales together; signs are ratios). Resample
    * invariance is NOT claimed — a resample moves spectral content by
    * design; route rate-normalized copies through [[audioFp64Of]]'s
    * contour or resample first. */
  def spectralFp64Of(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= AfpWindows, s"need at least $AfpWindows samples, got $n")
    val nBands = SfpLags.length
    val e = Array.ofDim[Long](SfpWindows, nBands)
    var b = 0
    while (b < nBands) {
      val lag = SfpLags(b)
      var i = lag
      while (i < n) {
        val w = ((i.toLong * SfpWindows) / n).toInt
        e(w)(b) += math.abs(samples(i).toLong - samples(i - lag))
        i += 1
      }
      b += 1
    }
    var sig = 0L
    var t = 1
    while (t < SfpWindows) {
      var bb = 0
      while (bb < nBands - 1) {
        val d = (e(t)(bb) - e(t)(bb + 1)) - (e(t - 1)(bb) - e(t - 1)(bb + 1))
        if (d > 0) sig |= 1L << ((t - 1) * (nBands - 1) + bb)
        bb += 1
      }
      t += 1
    }
    sig
  }

  /** Per-item spectral fingerprint over REAL parsed WAV PCM — the
    * [[audioFingerprints]] plumbing with [[spectralFp64Of]] as the hash;
    * short or hostile clips drop row-wise.
    *
    * @return (item_id, sfp) — feeds the same banded tail as every
    *         64-bit signature family */
  def spectralFingerprints(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { item =>
        if (item.kind != "audio") None
        else
          try wavPcm16Mono(item.content)
            .filter(_._2.length >= AfpWindows)
            .map { case (_, s) => (item.item_id, spectralFp64Of(s)) }
          catch { case _: Exception => None }
      }
    }.toDF("item_id", "sfp")
  }

  /** Load a directory of media files as MediaItems (binaryFile source:
    * splits by file, carries path/length/mtime metadata natively). */
  def readMediaDir(spark: SparkSession, dir: String, kind: String): Dataset[MediaItem] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("item_id"),
        lit(kind).as("kind"),
        col("content"),
        lit("application/octet-stream").as("mime"),
        col("path").as("source"))
      .as[MediaItem]
  }

  /** Partition-local decode: one decoder per partition, rows streamed —
    * the batching shape `mapInPandas` would give in PySpark. */
  def extractFeatures(items: Dataset[MediaItem], decoder: Decoder): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it => it.map(decoder.decode) }
  }

  /** Metadata-only projection — verifies the content column is prunable
    * (the parquet scan must not read payload bytes for this query). */
  def metadataOnly(items: Dataset[MediaItem]): DataFrame =
    items.select(col("item_id"), col("kind"), col("mime"), col("source"),
      length(col("content")).as("n_bytes"))

  /** One sampled frame of a video item (frames surface as image items so
    * downstream decode/feature ops compose unchanged). */
  final case class Frame(
      item_id: Long, // parent_id * 1000 + frame_index — stable join key
      parent_id: Long,
      frame_index: Int,
      ts_ms: Long,
      kind: String, // "image"
      content: Array[Byte],
      source: String)

  /** Frame sampling: `n` evenly spaced frames per video item — the
    * one-row-in → n-rows-out shape, as a narrow partition-local `flatMap`
    * (no shuffle; frames of one video never leave their task). Frame
    * payloads are STUBBED (md5 chain over parent bytes + index — no video
    * codec in this container); timestamps assume the stub decoder's
    * duration so the sampling arithmetic is real and testable. */
  def sampleFrames(items: Dataset[MediaItem], n: Int, decoder: Decoder): Dataset[Frame] = {
    import items.sparkSession.implicits._
    require(n >= 1, "need at least one frame")
    items.flatMap { item =>
      if (item.kind != "video") Iterator.empty
      else {
        // header probe, NOT a full decode: with a real codec, decoding just
        // to learn the duration would double the per-video cost
        val duration = decoder.probeDuration(item)
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until n).iterator.map { i =>
          md.reset()
          md.update(item.content)
          md.update(i.toByte)
          Frame(
            item_id = item.item_id * 1000L + i,
            parent_id = item.item_id,
            frame_index = i,
            // midpoint sampling: frame i at (i + 1/2)/n of the duration
            ts_ms = if (duration <= 0) 0L else (duration * (2 * i + 1)) / (2L * n),
            kind = "image",
            content = md.digest(), // deterministic 16-byte stub payload
            source = item.source)
        }
      }
    }
  }

  /** Resize: dimension metadata transform + payload rewrite, partition-
    * local (narrow). The pixel work is STUBBED (md5-derived payload sized
    * ∝ target area); the Spark plumbing — typed output, per-partition
    * batching, no shuffle — is real, and a codec-backed resizer drops in
    * behind the same signature. */
  final case class ResizedItem(
      item_id: Long, width: Int, height: Int, content: Array[Byte], source: String)

  def resizeImages(items: Dataset[MediaItem], width: Int, height: Int): Dataset[ResizedItem] = {
    import items.sparkSession.implicits._
    require(width > 0 && height > 0, "target dimensions must be positive")
    items.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.filter(i => i.kind == "image" || i.kind == "video").map { item =>
        md.reset()
        val seed = md.digest(item.content)
        // stub payload: digest chain stretched to ~area/64 bytes
        val nBytes = math.max(16, width * height / 64)
        val out = new Array[Byte](nBytes)
        var off = 0
        var block = seed
        while (off < nBytes) {
          val len = math.min(block.length, nBytes - off)
          System.arraycopy(block, 0, out, off, len)
          off += len
          block = md.digest(block)
        }
        ResizedItem(item.item_id, width, height, out, item.source)
      }
    }
  }
}
