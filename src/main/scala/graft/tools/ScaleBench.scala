package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a ×N replica of an sf dir's `documents`/`embeddings` tables for
  * scale-slope measurement (`runMain graft.tools.ScaleUp <src> <dest> <N>`).
  *
  * Replicas are DECORRELATED, not duplicated — both transforms are
  * bijections applied uniformly to one replica, so WITHIN-replica
  * duplicate/near-dup structure is preserved exactly while CROSS-replica
  * similarity collapses:
  *
  *  - text: every token of replica k gets the suffix `~k` — token n-gram
  *    sets map 1:1 (within-replica Jaccard unchanged) but share nothing
  *    across replicas. (A word ROTATION does not work: the n-gram multiset
  *    survives rotation modulo the seam, so every replica stays a
  *    near-dup of its source and pair counts grow ×N² by construction —
  *    measured, not hypothetical.)
  *  - embeddings: replica k is multiplied by a deterministic ±1 diagonal
  *    D_k (sign from xxhash64(i, k)) — orthogonal, so all within-replica
  *    inner products and norms are EXACTLY preserved, while cross-replica
  *    cosines shrink to ~1/√dim noise.
  *
  * Ids remap to `id + k·(max+1)` — disjoint ranges per replica. Replica 0
  * is the original data byte-for-byte. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <destDir> <factor>")
    val Array(src, dest, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ks = broadcast(spark.range(factor).select(col("id").cast("int").as("k")))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val words = split(col("text"), " ")
    val suffixed = array_join(
      transform(words, w => concat(w, lit("~"), col("k").cast("string"))), " ")
    docs.crossJoin(ks)
      .select(
        (col("doc_id") + col("k").cast("long") * maxDoc).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(suffixed).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    // D_k: per-(dimension, replica) deterministic sign — orthogonal within
    // a replica, decorrelating across replicas
    val flipped = zip_with(
      col("embedding"),
      transform(col("embedding"), (_, i) =>
        (pmod(xxhash64(i, col("k")), lit(2)) * 2 - 1).cast("float")),
      (x, s) => x * s)
    emb.crossJoin(ks)
      .select(
        (col("vec_id") + col("k").cast("long") * maxVec).as("vec_id"),
        when(col("k") === 0, col("embedding")).otherwise(flipped).as("embedding"),
        col("label"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    // events: ids and users remap to disjoint ranges per replica — every
    // replica keeps its sessions/as-of/range structure exactly (same
    // timestamps), and nothing joins across replicas because user_id never
    // collides. Read through FixtureLoader (encoding-drift tolerance) and
    // remap only the two id columns — everything else passes through, so a
    // driver re-export that adds a column survives unchanged.
    val ev = graft.sources.FixtureLoader.load(spark, src, "events")
    val maxEvent = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    val maxUser = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    val evCols = ev.columns.map {
      case "event_id" => (col("event_id") + col("k").cast("long") * maxEvent).as("event_id")
      case "user_id" => (col("user_id") + col("k").cast("long") * maxUser).as("user_id")
      case other => col(other)
    }
    ev.crossJoin(ks)
      .select(evCols.toIndexedSeq: _*)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/events.parquet")

    // Dimension and control-plane tables (customer, nation, orders, ...)
    // pass through UNSCALED, byte-for-byte: the decade measurement scales
    // the FACT side ×N while dimensions stay fixed — exactly the 100 TB
    // posture (a stream-static enrich broadcasts the same dimension no
    // matter how large the stream grows), and queries that stage CDC/event
    // fixtures from them keep working against the scaled dir.
    val scaledNames = Set("documents.parquet", "embeddings.parquet", "events.parquet")
    val srcPath = java.nio.file.Paths.get(src)
    val destPath = java.nio.file.Paths.get(dest)
    java.nio.file.Files.list(srcPath).iterator().asScala
      .filterNot(p => scaledNames.contains(p.getFileName.toString))
      .foreach { p =>
        val target = destPath.resolve(srcPath.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) {
          java.nio.file.Files.walk(p).iterator().asScala.foreach { q =>
            val t = destPath.resolve(srcPath.relativize(q))
            if (java.nio.file.Files.isDirectory(q)) java.nio.file.Files.createDirectories(t)
            else java.nio.file.Files.copy(q, t,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        } else java.nio.file.Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }

    println(s"[scaleup] wrote ${factor}x documents+embeddings+events " +
      s"(+ unscaled dimension passthrough) from $src to $dest")
    spark.stop()
  }
}

/** Fixed-batch revision probe (VERDICT r15 #8): the q126/q127 decade
  * slopes scale the revision batch WITH the corpus, so they cannot see
  * a per-drain corpus-proportional term (the r14 lesson — a drain cost
  * ∝ corpus hides inside a slope whose numerator and denominator both
  * grew). This probe holds the revision batch CONSTANT (64 documents /
  * 64 vectors) while the corpus decades, builds each index family at
  * both sizes (the lexical docs tier bucketed under the constant-
  * bucket-bytes rule: `docBuckets` ×factor at the scaled dir), upserts
  * the SAME batch, and reports `drift = t_scaled / t_base` per family —
  * flat (≈1) means the drain does NO corpus-proportional work. Before
  * r16's bucketed docs tier the lexical drain read the full postings
  * tier here and measured ∝ corpus; COVERAGE.md records the numbers.
  *
  * `runMain graft.tools.RevisionProbe <baseSfDir> <scaledDir> <factor>`
  * (sf0.01 → sf0.1 is a real decade — no ScaleUp replica needed). */
object RevisionProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: RevisionProbe <baseSfDir> <scaledDir> <factor>")
    val Array(base, scaled, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{CacheScope, IvfIndex, PostingsIndex, TableStore}

    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString

    /** (lexical drain sec, vector drain sec) at `dir` — two measured
      * passes each (state advances between them; both exercise the full
      * gated fold), min taken. The builds are fixture, untimed. */
    def run(dir: String, docBuckets: Int): (Double, Double) = {
      val docs = graft.sources.FixtureLoader.load(spark, dir, "documents")
      val emb = graft.sources.FixtureLoader.load(spark, dir, "embeddings")
      val bmStore = new TableStore(tmp("revprobe-bm"))
      PostingsIndex.build(docs, "doc_id", "text", bmStore, "bm",
        docBuckets = docBuckets)
      // the FIXED batch: the 64 smallest doc ids, revised — identical
      // rows at both corpus sizes
      val docBatch = docs.orderBy(col("doc_id")).limit(64)
        .select(col("doc_id"),
          concat(col("text"), lit(" revised edition")).as("text"))
      val tLex = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        PostingsIndex.upsert(spark, docBatch, "doc_id", "text", bmStore, "bm")
        (System.nanoTime() - t0) / 1e9
      }.min
      val ivfStore = new TableStore(tmp("revprobe-ivf"))
      locally {
        implicit val scope: CacheScope = new CacheScope
        try IvfIndex.build(emb, "vec_id", "embedding",
          nCells = math.max(4, math.sqrt(emb.count().toDouble).toInt / 2),
          iterations = 2, ivfStore, "emb")
        finally scope.release()
      }
      val vecBatch = emb.orderBy(col("vec_id")).limit(64)
        .select(col("vec_id"), col("embedding"))
      val tVec = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        IvfIndex.upsert(spark, vecBatch, "vec_id", "embedding", ivfStore, "emb")
        (System.nanoTime() - t0) / 1e9
      }.min
      graft.operators.CacheScope.appLifetime.release()
      (tLex, tVec)
    }

    val baseBuckets = 8
    val (lexB, vecB) = run(base, baseBuckets)
    val (lexS, vecS) = run(scaled, baseBuckets * factor)
    val json =
      s"""{"metric":"revision_drift","factor":$factor,"base":"$base",""" +
        s""""scaled":"$scaled","batch_rows":64,""" +
        s""""bm25":{"base_sec":${f"$lexB%.3f"},"scaled_sec":${f"$lexS%.3f"},""" +
        s""""drift":${f"${lexS / lexB}%.3f"}},""" +
        s""""ivf":{"base_sec":${f"$vecB%.3f"},"scaled_sec":${f"$vecS%.3f"},""" +
        s""""drift":${f"${vecS / vecB}%.3f"}},"flag_above":2.0}"""
    println(json)
    spark.stop()
  }
}

/** Fixed-batch SCREEN-DRAIN probe (VERDICT r16 #7): the admission-loop
  * decade slopes run on constant fixtures, so they scale the BATCH and
  * are blind to stored-state growth — exactly where a screen that
  * re-derives its candidate projection from the full stored index hides
  * its ∝-corpus term. This probe holds the screen batch CONSTANT
  * (64 items) while the STORED INDEX decades, and reports
  * `drift = t_scaled / t_base` per screen face — flat (≈1) means the
  * screen does no stored-state-proportional work.
  *
  * Faces measured: the text family's containment screen + Jaccard screen
  * + supersede drain (r17's persisted bucketed projections — expected
  * flat under the constant-bucket-bytes rule), and the perceptual/frame
  * banded screens (which still re-band their 8-byte/item stored tiers
  * per drain — expected ∝ stored, recorded honestly; their stored rows
  * are 8 B/item, so the term is ~100× smaller than the text one was).
  *
  * `runMain graft.tools.ScreenProbe <baseSfDir> <scaledDir> <factor>` */
object ScreenProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScreenProbe <baseSfDir> <scaledDir> <factor>")
    val Array(base, scaled, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{CacheScope, FrameIndex, PerceptualIndex, SignatureIndex, TableStore}

    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString

    /** Per-face screen seconds at `dir` (two passes, min — screens are
      * read-only, so state does not advance). Bucket counts scale with
      * the factor (the constant-bucket-bytes rule). */
    def run(dir: String, scale: Int): Map[String, Double] = {
      val docs = graft.sources.FixtureLoader.load(spark, dir, "documents")
      // the FIXED batch: revised copies of the 64 smallest doc ids —
      // identical rows at both corpus sizes
      val batch = docs.orderBy(col("doc_id")).limit(64)
        .select(col("doc_id"),
          concat(col("text"), lit(" revised edition")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      def timeFace(body: => Unit): Double =
        (1 to 2).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min

      val sigStore = new TableStore(tmp("scrprobe-sig"))
      SignatureIndex.build(docs, "doc_id", "text",
        SignatureIndex.Params(3, 128, 32), sigStore, "c",
        sigBuckets = 8 * scale, posBuckets = 32 * scale, bandBuckets = 16 * scale)
      val tCont = timeFace {
        implicit val scope: CacheScope = new CacheScope
        try SignatureIndex.screenContainment(spark, batch, "doc_id", "text",
          sigStore, "c", minContainment = 0.75).count()
        finally scope.release()
      }
      val tJac = timeFace {
        implicit val scope: CacheScope = new CacheScope
        try SignatureIndex.screen(spark, batch, "doc_id", "text",
          sigStore, "c", threshold = 0.8).count()
        finally scope.release()
      }
      // supersede advances state — one timed pass, and it MUTATES
      // sigStore, so this face must stay LAST among the text faces:
      // reordering would contaminate the screen timings above with the
      // supersede's committed admissions/tombstones (the ordering is
      // load-bearing, documented rather than paying a store copy here)
      val tSup = {
        implicit val scope: CacheScope = new CacheScope
        val t0 = System.nanoTime()
        try SignatureIndex.supersede(spark, batch, "doc_id", "text",
          sigStore, "c", minContainment = 0.75).count()
        finally scope.release()
        (System.nanoTime() - t0) / 1e9
      }

      // perceptual/frame: 64-bit signatures derived from the text hash —
      // the probe measures screen COST shape, not match quality
      val sigs = docs.select(col("doc_id").as("id"), xxhash64(col("text")).as("sig"))
      val percStore = new TableStore(tmp("scrprobe-perc"))
      PerceptualIndex.build(sigs, maxHamming = 3, percStore, "p")
      val batchSigs = batch.select(col("doc_id").as("id"),
        xxhash64(col("text")).as("sig"))
      val tPerc = timeFace {
        implicit val scope: CacheScope = new CacheScope
        try PerceptualIndex.screen(spark, batchSigs, percStore, "p").count()
        finally scope.release()
      }
      val frames = docs.select(col("doc_id").as("id"),
          explode(sequence(lit(0), lit(7))).as("frame"))
        .withColumn("sig", xxhash64(col("id"), col("frame")))
      val frameStore = new TableStore(tmp("scrprobe-frame"))
      FrameIndex.build(frames, maxHamming = 3, minContainment = 0.75,
        frameStore, "f")
      val batchFrames = batch.select(col("doc_id").as("id"),
          explode(sequence(lit(0), lit(7))).as("frame"))
        .withColumn("sig", xxhash64(col("id"), col("frame"), lit(1)))
      val tFrame = timeFace {
        implicit val scope: CacheScope = new CacheScope
        try FrameIndex.screen(spark, batchFrames, frameStore, "f").count()
        finally scope.release()
      }
      batch.unpersist()
      graft.operators.CacheScope.appLifetime.release()
      Map("text_containment" -> tCont, "text_jaccard" -> tJac,
        "text_supersede" -> tSup, "perceptual" -> tPerc, "frame" -> tFrame)
    }

    val b = run(base, 1)
    val s = run(scaled, factor)
    val faces = Seq("text_containment", "text_jaccard", "text_supersede",
      "perceptual", "frame")
    val body = faces.map { f =>
      s""""$f":{"base_sec":${f"${b(f)}%.3f"},"scaled_sec":${f"${s(f)}%.3f"},""" +
        s""""drift":${f"${s(f) / b(f)}%.3f"}}"""
    }.mkString(",")
    println(
      s"""{"metric":"screen_drift","factor":$factor,"base":"$base",""" +
        s""""scaled":"$scaled","batch_rows":64,$body,"flag_above":2.0}""")
    spark.stop()
  }
}

/** Scale-slope measurement over the heavy query family: one decade of
  * ACTUAL scaling data for the operators whose 100 TB arguments are
  * otherwise plan-shape reasoning. Runs each query at the base dir and at
  * the scaled dir (built by [[ScaleUp]]), reports
  * `slope = t_scaled / (t_base · factor)` — 1.0 is perfectly linear; the
  * flag threshold leaves room for shuffle growth (n·log n and fixed
  * overheads amortizing differently across a decade).
  *
  * `runMain graft.tools.ScaleBench <baseDir> <scaledDir> <factor>` →
  * BENCH_sf1.json. */
object ScaleBench {
  private val heavy = Seq(
    "q23_minhash_lsh", "q24_simhash_pairs", "q28_dup_clusters",
    "q29_ivf_topk", "q30_lsh_topk", "q33_near_dedup",
    "q36_near_dedup_approx", "q42_top_ngrams", "q61_semdedup_cells",
    // r6 additions: the multiprobe remedy shipped in r5 without a decade
    // measurement, and the two persisted-index screens (build+probe cost)
    "q71_lsh_multiprobe", "q68_semantic_screen", "q69_signature_screen",
    // span removal: two corpus-token-sized explodes + a gram-hash agg —
    // the newest heavy-family member measures from day one
    "q82_span_dedup",
    // IVF-PQ: grouped-Lloyd training + cell-bounded ADC, cells sized ∝ n
    "q84_pq_topk",
    // two-stage refine: q84's chain at nProbe=10 + exact re-rank of the
    // 64-deep shortlist — the quality operating point
    "q85_pq_refined",
    // persisted-PQ serving: probe + ADC + refine over COMMITTED codes —
    // the index build itself is staged once per dir, outside the timing
    "q87_pq_persisted",
    // event-time joins (r6 verdict item 8): the as-of union-merge and the
    // chunk-equi-ized range join, measured at their real decade shapes
    "q34_asof_join", "q35_range_join",
    // streaming drains (r7 verdict item 4): the file-source fixtures keep
    // 5 staged files at any SF, so these measure whether the ~4.5 s
    // per-drain cost is micro-batch constant overhead (slope ≪ 1) or
    // data-proportional state/shuffle growth. q26/q67 are NOT here: their
    // CDC stage caps input at 30k rows by construction
    // (SparkEntry.prepareCdcStage), so their cost is a documented
    // constant term, not a measurable slope — see COVERAGE.md.
    "q78_event_sessions", "q80_event_windows", "q81_stream_dedup",
    // r8 additions: the wide-probe IVF quality tier (q29's chain at
    // 2.5× candidates), BM25's narrow-pass + 1-row-barrier shape, the
    // per-stratum budget sort, and the KMV sketch's distinct + top-k
    "q92_ivf_wide", "q89_bm25", "q90_token_budget", "q93_kmv_distinct",
    // r9 additions: the stream-static enrich drain (r8 verdict item 4 —
    // broadcast-join claim at ×10, previously argued not measured), the
    // batch-BM25 inverted index (postings shuffle ∝ corpus tokens AND
    // probe count ∝ SF — the honest compound-growth measurement), and
    // the level-sample quantile sketch (one sub-b aggregate exchange)
    "q96_stream_enrich", "q97_bm25_batch", "q98_quantile_sketch",
    // r9 second wave: the CMS cells aggregate, both funnel faces (batch
    // fold + streaming state drain), the cohort matrix's co-partitioned
    // join, and the sketch-boundary bucket assignment
    "q100_cms_counts", "q101_funnel", "q102_cohort_retention",
    "q103_stream_funnel", "q104_quality_deciles",
    // profile serving (build+append staged per dir, untimed): these
    // measure that serving statistics from committed sketch state is
    // corpus-size-independent — the q87 argument for the profile family
    "q105_profile_serve", "q106_profile_freq",
    // streamed admission into the profile: per-drain cost = the sketch
    // aggregates over each micro-batch + the batchId-gate commits
    "q107_stream_profile",
    // r11: heavy-hitter discovery — the MG candidate aggregate scans the
    // token stream (∝ corpus) and the verify count's shuffle is capped
    // at groups × k keys, so the decade slope should track the scan
    "q108_heavy_hitters",
    // r11: the PQ-persisted ≥0.9 quality point (q87's chain one probe
    // wider — candidate volume grows 5/4, everything else identical)
    "q109_pq_quality",
    // r12: exactly-once streaming admission into the index family —
    // per-drain cost = refit-free assignment + insert-only unions per
    // micro-batch + one manifest swap each; the seed fit is fixture
    "q110_stream_index",
    // r12: batch BM25 served from the persisted postings index — the
    // per-call (doc, term) shuffle q97 pays is gone; serving scales with
    // Σ df(probed terms) + the vocabulary-sized termstats read
    "q111_bm25_persisted",
    // r13: exactly-once postings admission — per-drain cost = one
    // tokenize+count pass over each micro-batch + O(batch) linked
    // appends + one manifest swap; the 90% seed build is fixture
    "q113_stream_bm25",
    // r13: leakage-safe split — the q28 pair plan + components, plus one
    // corpus-vs-clustered-subset left join and the narrow interval draw
    "q115_leakage_split",
    // r13: pairwise overlap from KMV synopses — the corpus-token-sized
    // sketch pass (q93's shape over an exploded token stream) dominates;
    // pairing is a broadcast self-join of G × k synopsis rows
    "q118_corpus_overlap",
    // r13: overlap SERVED from committed profile state — reads G × ≤k
    // hash rows + the G² pairing; must be corpus-size-independent like
    // the q105/q106 serving rows (the fixture build is staged per dir)
    "q119_profile_overlap",
    // r14: perceptual-hash image near-dup — decode+hash is a narrow
    // per-item pass over a CONSTANT 120-image fixture, so the decade
    // should be wall-flat; what this measures is that the signature
    // band join never densifies
    "q121_image_neardup",
    // r14: HTML→text extraction — one codegen regex chain over every
    // doc; the honest scan-speed claim at ×10
    "q122_html_extract",
    // r14: the streamed-index quality tier — q110's drain + serving at
    // nProbe=6 (3× the candidate volume of the budget tier)
    "q123_stream_quality",
    // r14: triplet selection — q114's mining pass + a per-row filter;
    // the slope must be the miner's (probes ∝ SF × corpus scan)
    "q124_triplets",
    // r14: cross-store profile overlap — two synopsis reads + the
    // broadcast pairing; must be corpus-size-independent (both
    // profile builds are staged per dir, untimed)
    "q125_cross_profile_overlap",
    // r14 (re-shaped r15/r16): streamed UPSERT admission, both families —
    // per-drain cost is now O(batch ∪ overlay) committed bytes (revision
    // overlay) and, on the lexical side, a bucket-pruned keyed read of
    // the docs tier for the exact-df subtraction; these slopes scale the
    // batch WITH the corpus (the fixture's %-slices), so the fixed-batch
    // complement is tools/RevisionProbe (drift 0.81/0.75 at 10×)
    "q126_stream_bm25_upsert", "q127_stream_ivf_upsert",
    // r14: mining through the against-probe IVF path — candidate work is
    // probe-batch-bound (%23 of the corpus) instead of corpus-bound; the
    // decade verifies the 23× candidate saving holds as n grows
    "q116_hard_negatives_ann",
    // r14: directed containment pairs — the q15/q28 shingle-postings plan
    // with directed denominators; the slope must stay in that family
    "q128_containment_pairs",
    // r14: pixel-feature similar-image search — constant 120-image
    // fixture (wall-flat by design); verifies decode+search never densify
    "q129_image_similarity",
    // r14: image admission screen — constant 160-image fixture, both
    // sides of the against-band join fixed; verifies the per-side hot
    // cap + band join stay wall-flat
    "q130_image_screen",
    // r14: video near-dup — constant 720-frame fixture; verifies the
    // frame-keyed banding and the per-pair frame vote never densify
    "q131_video_neardup",
    // r14: audio near-dup — constant 90-clip fixture (real WAV parse +
    // energy-contour hash per item); verifies the shared banded tail
    // stays wall-flat with a third signature family riding it
    "q132_audio_neardup",
    // r15: the managed perceptual index — seed + streamed admission +
    // manifest-pinned screen; same constant fixture as q130, so the
    // slope isolates the index machinery (copy, drains, pinned reads)
    "q133_image_screen_indexed",
    // r15: directed video containment — constant fixture (originals +
    // 2-frame clips); verifies the frameless band join + per-side
    // distinct-frame counts stay wall-flat
    "q134_video_containment",
    // r15: spectral audio fingerprint — constant 90-clip fixture (real
    // WAV parse + lag-filterbank double-difference hash); the fourth
    // signature family riding the shared banded tail
    "q135_audio_spectral",
    // r15: the mining family's declared ≥0.9 tier — q116's candidate
    // chain at (nProbe=13, shortlist=50); same ~nProbe/nCells-of-corpus
    // per-probe shape, so the slope matches its siblings
    "q136_hard_negatives_premium",
    // r15: the image keeper — q121's constant fixture through decode ×2
    // + the pair/cluster/argmax tail; verifies the end-to-end keeper
    // composition stays wall-flat
    "q137_image_keep_best",
    // r15: the video admission screen — constant fixture; verifies the
    // frameless against-band join + arrival-side containment stay flat
    "q138_video_screen",
    // r15: the screen-then-admit loop — constant fixture through three
    // gated drains with evolving stored state; verifies the loop's
    // per-drain screen + O(batch) admission stay wall-flat
    "q139_image_admission_loop",
    // r16: the managed video admission loop — constant fixture (30
    // originals, seed + three screen-then-admit drains); verifies the
    // containment screen + O(batch) admissions stay wall-flat
    "q140_video_screen_indexed",
    // r16: the audio admission loop — constant 90-clip spectral fixture
    // through three gated drains; the q139 shape on the fourth family
    "q141_audio_admission_loop",
    // r16: keeper-aware admission — constant fixture through three
    // keeper drains; per-drain screen + the replace-if-better fold
    // (replacement rewrites are of the 8–16 B/item sigs member)
    "q142_image_keeper_admission",
    // r16: video supersede — the containment keeper: per-drain directed
    // screen + tombstoned retirements (frame appends + rm-id merges)
    "q143_video_supersede_admission",
    // r16: text supersede — sketch containment at the admission gate;
    // r17 serves its candidates from the persisted bucketed position tier
    "q144_text_supersede_admission",
    // r17: semantic admission — the SemDeDup screen-then-admit loop on
    // the IVF family; the fixture's drain slices scale with the corpus,
    // so this one measures the probe/screen/admit chain genuinely growing
    "q145_semantic_admission_loop",
    // r17: video quality keeper — constant 30-group fixture through
    // three keeper drains; directed-containment screen + quality joins
    "q146_video_keeper_admission",
    // r17: text quality keeper — constant 30-doc universe through three
    // keeper drains; banded candidates from the persisted projection
    "q147_text_keeper_admission")

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleBench <baseSfDir> <scaledDir> <factor>")
    val Array(base, scaled, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false")
    // dev knob: let AQE start shuffles wider than the steady-state
    // partition count and coalesce down (spill probe for the scaled dir)
    sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS").foreach(n =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev knob: comma-separated query subset for targeted slope probes
    val selected = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet)
      .map(only => heavy.filter(only.contains))
      .getOrElse(heavy)

    // q108's declared 2% threshold cannot survive the scale fixture's
    // word~k suffixing: every token's relative frequency divides by the
    // replication factor, so at sf1 the thresholded set is EMPTY and the
    // slope would time an empty verify path (ADVICE r11). The slope-only
    // scaled-dir variant divides minFrac by the factor — the equivalent
    // workload on the diluted vocabulary: each base heavy token maps to
    // `factor` suffixed variants at freq/factor, so the thresholded set
    // scales ×factor and the verify shuffle is genuinely exercised.
    def scaledVariant(
        name: String): Option[(org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = name match {
      // the CANONICAL q108 body (SparkEntry.heavyHittersQuery — one
      // definition, two sites) at the factor-adjusted threshold
      case "q108_heavy_hitters" =>
        Some(graft.SparkEntry.heavyHittersQuery(0.02 / factor))
      case _ => None
    }

    def time(name: String, dir: String, scaledDir: Boolean): (Double, Long) = {
      val q = (if (scaledDir) scaledVariant(name) else None)
        .getOrElse(graft.SparkEntry.queries(name))
      var rows = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = q(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // release app-lifetime pins between measurements — same hygiene
      // rationale as the Bench loop: 21 queries × 2 dirs of accumulated
      // MEMORY_AND_DISK pins make late queries (q84/q85) measure earlier
      // queries' GC/spill pressure, which corrupts the slope RATIO both
      // ways (base and scaled inflate differently). Within-query passes
      // still share the warm cache.
      graft.operators.CacheScope.appLifetime.release()
      // streaming-state hygiene, same rationale as the Bench loop: unload
      // accumulated state-store providers + maintenance between queries
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case scala.util.control.NonFatal(_) => () } // fatal (OOM etc.) must surface
      (times.min, rows)
    }

    // JVM warmup + once-per-dir fixture staging (index builds, event
    // stages) outside the measured region, at BOTH dirs — same rationale
    // as the Bench loop: a fixture build inside a timed pass measures
    // the build, not the plan
    graft.SparkEntry.prepareSharedFixtures(spark, base)
    graft.SparkEntry.prepareSharedFixtures(spark, scaled)
    graft.SparkEntry.queries(selected.head)(spark, base).count()
    graft.operators.CacheScope.appLifetime.release()

    val rows = selected.map { name =>
      val (tBase, rBase) = time(name, base, scaledDir = false)
      val (tScaled, rScaled) = time(name, scaled, scaledDir = true)
      val slope = tScaled / (tBase * factor)
      if (rScaled == 0 && rBase > 0)
        println(s"[scalebench] WARNING $name produced EMPTY scaled output — " +
          "the slope times a degenerate run; fix the fixture or add a scaledVariant")
      println(f"[scalebench] $name%-24s base=$tBase%7.2fs scaled=$tScaled%7.2fs " +
        f"slope=$slope%5.2f rows: $rBase -> $rScaled")
      (name, tBase, tScaled, slope, rBase, rScaled)
    }

    // Since r6 the DECLARED q29/q30 derive their index parameters from the
    // corpus size (the former "sized_params" remedy is the shipped form),
    // so the heavy list above measures the scale-safe operating points
    // directly — no separate remedy section.
    val qs = rows.map { case (n, tb, ts, sl, rb, rs) =>
      s""""$n":{"base_sec":${f"$tb%.4f"},"scaled_sec":${f"$ts%.4f"},""" +
        s""""slope":${f"$sl%.4f"},"base_rows":$rb,"scaled_rows":$rs}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"scale_slope","factor":$factor,"base":"$base",""" +
      s""""scaled":"$scaled","cpus":$cpus,"flag_above":1.5,"queries":$qs}"""
    println(json)
    // a filtered or re-configured probe run must not clobber the committed
    // full-surface artifact
    if (sys.env.contains("SPARK_GRAFT_ONLY") ||
        sys.env.contains("SPARK_GRAFT_INITIAL_PARTITIONS"))
      println("[scalebench] probe run (filtered/reconfigured): BENCH_sf1.json NOT written")
    else
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_sf1.json"), json + "\n")
    spark.stop()
  }
}
