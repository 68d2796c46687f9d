package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted FRAME-signature index — [[PerceptualIndex]] for families
  * with MANY rows per item (reference discipline: incremental state
  * maintenance, control_migration_schema_script.sql:244, 412–416): a
  * video is `n` sampled frames × 8 bytes ([[Multimodal.sampleFrames]] →
  * decode → [[Multimodal.dHashes]]), and its admission rule is
  * CONTAINMENT, not per-signature hamming — an arrival whose frames are
  * all within budget of stored frames adds nothing (a re-encode, a cut
  * clip), while a partial overlap admits. [[PerceptualIndex]] cannot
  * hold this family: one row per id, and its screen has no directed
  * denominator. Here the stored corpus is `(id, frame, sig)`, the
  * manifest pins BOTH screening parameters (`max_hamming` per frame,
  * `min_containment` per video) alongside the member version and the
  * admission gate, and every mutation is one manifest swap.
  *
  * Storage (the [[IvfIndex]]/[[CorpusProfile]] manifest discipline,
  * fifth instance):
  *  - `<name>_frames` — `(id, frame, sig: long)`, the indexed corpus;
  *  - `<name>_manifest` — frames version + `max_hamming` +
  *    `min_containment` + the streaming gate's `last_batch_id`.
  *
  * The admission loop ([[admitNovelBatch]]): SCREEN the arriving videos
  * against committed state with [[Dedup.videoContainmentAgainst]] (the
  * arrival-side Broder denominator — rejecting is about what the
  * arrival adds), admit every frame of the non-contained arrivals,
  * record the batchId — one swap, so the stored set EVOLVES between
  * drains exactly once per delivered batch.
  *
  * Scale shape: [[append]]/admission commit ONLY the batch's frame rows
  * (linked members, [[OverlayLock.appendOrCompact]]); [[screen]] is the
  * frameless chunk-band pigeonhole equi-join of
  * [[Dedup.videoContainmentAgainst]] — batch-proportional work against
  * 8 bytes × frames of serving state, hot buckets capped on both sides,
  * per-arrival frame counts broadcast.
  */
object FrameIndex {

  private def framesTable(name: String) = s"${name}_frames"
  // tombstone member: VIDEO ids whose frame rows are retired by a
  // supersede fold ([[admitSupersedeBatch]] — the full cut retiring the
  // stored clip it subsumes); the read-time subtraction that keeps a
  // supersede drain from rewriting the whole frames member (the
  // [[PerceptualIndex]] keeper-tombstone discipline on the frame family)
  private def rmTable(name: String) = s"${name}_rm"
  private def manifestTable(name: String) = s"${name}_manifest"
  private val manifestFile = "manifest.json"

  /** Tombstone-compaction policy — [[IvfIndex.OvlFrac]]'s rationale on
    * the retired-id set's bytes vs the frames member's. */
  private val RmFloorBytes: Long = IvfIndex.OvlFloorBytes
  private val RmFrac: Double = IvfIndex.OvlFrac

  /** Frames pin + both screening budgets + the admission gate; `rmFrames`
    * pins the tombstone member when a supersede/keeper fold has retired
    * ids. `hasQuality` marks a KEEPER family ([[buildWithQuality]]): the
    * frames member carries a per-video quality column and mutates through
    * [[admitKeepBestBatch]]'s replace-if-better fold — the two layouts
    * never mix (the [[PerceptualIndex.PercManifest]] guard). */
  private[graft] final case class FrameManifest(
      frames: Int, maxHamming: Int, minContainment: Double,
      lastBatchId: Long = -1L, rmFrames: Option[Int] = None,
      hasQuality: Boolean = false)

  private def encodeManifest(m: FrameManifest): String =
    s"""{"frames_v":${m.frames},"max_hamming":${m.maxHamming},""" +
      s""""min_containment":${m.minContainment},""" +
      s""""has_quality":${if (m.hasQuality) 1 else 0},""" +
      s""""rm_frames_v":${m.rmFrames.getOrElse(-1)},""" +
      s""""last_batch_id":${m.lastBatchId}}"""

  private def decodeManifest(s: String): FrameManifest = {
    def raw(k: String): String = {
      val i = s.indexOf("\"" + k + "\":")
      require(i >= 0, s"frame-index manifest missing $k: $s")
      val from = i + k.length + 3
      val end = s.indexWhere(c => c == ',' || c == '}', from)
      s.substring(from, end).trim
    }
    // absent = pre-tombstone / pre-quality manifest (older persisted index)
    val rm =
      if (s.indexOf("\"rm_frames_v\":") < 0) None
      else { val v = raw("rm_frames_v").toInt; if (v < 0) None else Some(v) }
    val hasQ = s.indexOf("\"has_quality\":") >= 0 && raw("has_quality") != "0"
    FrameManifest(raw("frames_v").toInt, raw("max_hamming").toInt,
      raw("min_containment").toDouble, raw("last_batch_id").toLong, rm, hasQ)
  }

  private def requirePlain(m: FrameManifest, name: String, op: String): Unit =
    require(!m.hasQuality,
      s"frame index $name is a KEEPER family (quality-carrying) — " +
        s"$op would drop its quality column; use admitKeepBestBatch/Stream")

  private def requireQuality(m: FrameManifest, name: String, op: String): Unit =
    require(m.hasQuality,
      s"frame index $name is a plain family — $op needs a " +
        "quality-carrying index; build it with buildWithQuality")

  private[graft] def readManifest(
      store: TableStore, name: String): Option[(FrameManifest, Int)] =
    store.currentVersion(manifestTable(name)).map { v =>
      val f = java.nio.file.Paths.get(store.pathAt(manifestTable(name), v))
        .resolve(manifestFile)
      (decodeManifest(new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)), v)
    }

  private def requireManifest(store: TableStore, name: String): (FrameManifest, Int) =
    readManifest(store, name).getOrElse(throw new IllegalStateException(
      s"frame index $name has no manifest — build it first"))

  private def commitManifest(
      store: TableStore, name: String, m: FrameManifest, expected: Option[Int]): Unit =
    store.commitFile(manifestTable(name), manifestFile,
      encodeManifest(m).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      expected)

  private def withLock[A](store: TableStore, name: String)(body: => A): A =
    OverlayLock.withLock(store, "frame", name)(body)

  private def rollbackAll(store: TableStore, name: String, m: FrameManifest): Unit = {
    OverlayLock.rollbackIfAhead(store, framesTable(name), m.frames)
    m.rmFrames.foreach(OverlayLock.rollbackIfAhead(store, rmTable(name), _))
  }

  /** The SERVED frame corpus: base ∖ tombstoned VIDEO ids (a supersede
    * fold's retirements — their frame rows stay in the files until the
    * amortized fold). The tombstone set is compaction-bounded, so it
    * broadcasts into the anti-join; an index no supersede fold has
    * touched has no pin and reads the base directly. */
  private def servedFramesAt(
      spark: SparkSession, store: TableStore, name: String,
      m: FrameManifest): DataFrame = {
    val base = store.snapshotAt(spark, framesTable(name), m.frames)
    m.rmFrames match {
      case None => base
      case Some(pin) => base.join(broadcast(
          store.snapshotAt(spark, rmTable(name), pin).select(col("id"))),
        Seq("id"), "left_anti")
    }
  }

  private def frameShape(frames: DataFrame): DataFrame = {
    val Seq(idc, framec, sigc) = frames.columns.take(3).toSeq
    frames.select(col(idc).as("id"), col(framec).cast("int").as("frame"),
      col(sigc).cast("long").as("sig"))
  }

  /** `(id, frame, sig, q)` of a quality-carrying frame batch (first four
    * columns, any names) — `q` is a per-VIDEO score denormalized onto
    * every frame row (readers take max per id). */
  private def frameQualityShape(frames: DataFrame): DataFrame = {
    val Seq(idc, framec, sigc, qc) = frames.columns.take(4).toSeq
    frames.select(col(idc).as("id"), col(framec).cast("int").as("frame"),
      col(sigc).cast("long").as("sig"), col(qc).cast("double").as("q"))
  }

  // ------------------------------------------------------------------ build

  /** Persist `(id, frame, sig)` rows (first three columns, any names)
    * and the screening budgets. Rebuilding replaces the corpus; the
    * admission gate survives, as in every family here. */
  def build(
      frames: DataFrame,
      maxHamming: Int,
      minContainment: Double,
      store: TableStore,
      name: String): Unit = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        val prev = readManifest(store, name)
        prev.foreach { case (m, _) => rollbackAll(store, name, m) }
        val fv = store.write(frameShape(frames), framesTable(name))
        // a rebuild replaces the corpus wholesale — prior retirements are
        // moot, the tombstone pin clears
        commitManifest(store, name,
          FrameManifest(fv, maxHamming, minContainment,
            prev.map(_._1.lastBatchId).getOrElse(-1L)), prev.map(_._2))
      }
    }
  }

  /** [[build]] for a KEEPER family: persist `(id, frame, sig, quality)`
    * rows (first four columns, any names) — the quality score is whatever
    * the pipeline's keeper rule ranks by (decoded resolution, bitrate —
    * the q137 RefinedWeb rule on the video family), denormalized onto
    * every frame row so the replace-if-better fold
    * ([[admitKeepBestBatch]]) compares arrivals against stored quality
    * without re-decoding anything. */
  def buildWithQuality(
      frames: DataFrame,
      maxHamming: Int,
      minContainment: Double,
      store: TableStore,
      name: String): Unit = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        val prev = readManifest(store, name)
        prev.foreach { case (m, _) => rollbackAll(store, name, m) }
        val fv = store.write(frameQualityShape(frames), framesTable(name))
        commitManifest(store, name,
          FrameManifest(fv, maxHamming, minContainment,
            prev.map(_._1.lastBatchId).getOrElse(-1L),
            hasQuality = true), prev.map(_._2))
      }
    }
  }

  /** The indexed `(id, frame, sig)` corpus (manifest-pinned read,
    * supersede retirements subtracted). */
  def frames(spark: SparkSession, store: TableStore, name: String): DataFrame = {
    val (m, _) = requireManifest(store, name)
    servedFramesAt(spark, store, name, m)
  }

  /** The index's per-frame hamming budget, as persisted. */
  def maxHamming(store: TableStore, name: String): Int =
    requireManifest(store, name)._1.maxHamming

  /** The index's containment threshold, as persisted. */
  def minContainment(store: TableStore, name: String): Double =
    requireManifest(store, name)._1.minContainment

  // ---------------------------------------------------------- append/remove

  /** Fold a frame batch into committed state — INSERT-ONLY by VIDEO id
    * (a re-sent id is a no-op for ALL its frames: frame sets are
    * atomic per item, never merged across deliveries), O(batch) linked
    * member commit, one manifest swap. */
  def append(
      spark: SparkSession,
      frames: DataFrame,
      store: TableStore,
      name: String): Unit =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        appendStamped(spark, frames, store, name, None)
      }
      ()
    }

  private def appendStamped(
      spark: SparkSession, frames: DataFrame,
      store: TableStore, name: String, stamp: Option[Long],
      screenFirst: Boolean = false,
      maxBucketSize: Int = 200): Boolean = {
    val (m, mv) = requireManifest(store, name)
    requirePlain(m, name, "an insert-only fold")
    if (stamp.exists(_ <= m.lastBatchId)) return false
    rollbackAll(store, name, m)
    val stored = servedFramesAt(spark, store, name, m)
    // the screen-then-admit fold: drop batch videos CONTAINED in the
    // stored corpus (the persisted budgets), admit the rest whole —
    // both halves read the SAME pinned stored version, so the loop is
    // one atomic decision
    val batch0 = frameShape(frames)
    val batch =
      if (!screenFirst) batch0
      else {
        implicit val scope: CacheScope = new CacheScope
        try {
          val dup = Dedup.videoContainmentAgainst(batch0, stored,
              m.maxHamming, m.minContainment, maxBucketSize)
            .select(col("batch_id").as("id")).distinct()
          // materialize the survivor list before the scope's pins release
          val novel = batch0.join(broadcast(dup), Seq("id"), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          novel.count()
          novel
        } finally scope.release()
      }
    try {
      // insert-only against the BASE id set (⊇ retired ids until the
      // fold): a re-sent id is a no-op, and a SUPERSEDED id can never
      // re-enter under its own name and be silently hidden by the
      // tombstone subtraction
      val fresh = batch
        .join(store.snapshotAt(spark, framesTable(name), m.frames)
          .select(col("id")), Seq("id"), "left_anti")
        // at most one signature per (id, frame): a batch carrying a
        // frame twice (two staged files in one trigger) indexes the
        // smallest sig — deterministic under any partitioning (the
        // PerceptualIndex.appendStamped canonicalization)
        .groupBy(col("id"), col("frame")).agg(min(col("sig")).as("sig"))
      val fv = OverlayLock.appendOrCompact(store, framesTable(name), m.frames,
        stored, fresh)
      commitManifest(store, name,
        m.copy(frames = fv, lastBatchId = stamp.getOrElse(m.lastBatchId)), Some(mv))
      true
    } finally if (screenFirst) batch.unpersist()
  }

  /** Takedown: next frames version without ANY frame of the given ids —
    * after removal an arrival contained only in the removed videos is
    * admitted again (the screen's memory genuinely forgets). Returns
    * VIDEOS removed (not frame rows). */
  def remove(
      spark: SparkSession,
      ids: DataFrame,
      store: TableStore,
      name: String): Long =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        val (m, mv) = requireManifest(store, name)
        rollbackAll(store, name, m)
        val drop = broadcast(ids.select(col(ids.columns.head).as("_rm_id")).distinct())
        val stored = servedFramesAt(spark, store, name, m)
        val kept = stored.join(drop, stored("id") === col("_rm_id"), "left_anti")
        val before = stored.select(col("id")).distinct().count()
        val keptN = kept.select(col("id")).distinct().count()
        // the rewrite serves from the SERVED view, so pending supersede
        // retirements fold in here and the tombstone pin clears
        val fv = store.write(kept, framesTable(name), Some(m.frames))
        commitManifest(store, name, m.copy(frames = fv, rmFrames = None), Some(mv))
        before - keptN
      }
    }

  // --------------------------------------------------------------- admission

  /** Exactly-once micro-batch admission ([[CorpusProfile.admitBatch]]'s
    * gate): the frames advance and the batchId record are one atomic
    * swap. Returns true when folded, false when replayed. */
  def admitBatch(
      spark: SparkSession,
      frames: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        appendStamped(spark, frames, store, name, Some(batchId))
      }
    }

  /** The video admission loop as ONE exactly-once fold
    * ([[PerceptualIndex.admitNovelBatch]] with containment as the
    * rejection rule): SCREEN the batch's videos against committed state
    * — an arrival whose frame-containment against ANY stored video
    * reaches the persisted `min_containment` is rejected whole — admit
    * every frame of the rest, record the batchId, one swap. The stored
    * set EVOLVES between drains: a clip cut from a video admitted two
    * drains ago is rejected BY that admission. In-batch containment
    * between arrivals is not screened (the [[PerceptualIndex]] hole,
    * same rationale). Returns true when folded, false on replay. */
  def admitNovelBatch(
      spark: SparkSession,
      frames: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        appendStamped(spark, frames, store, name, Some(batchId),
          screenFirst = true, maxBucketSize = maxBucketSize)
      }
    }

  /** [[admitNovelBatch]] as a live sink — the managed video admission
    * loop. `availableNow = true` (default) drains and stops. */
  def admitNovelStream(
      stream: DataFrame,
      store: TableStore,
      name: String,
      checkpoint: String,
      availableNow: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DrainConf.withDrainConf(batch.sparkSession) {
          admitNovelBatch(batch.sparkSession, batch, batchId, store, name)
        }
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** Streaming admission without the screen (insert-only gated folds). */
  def admitStream(
      stream: DataFrame,
      store: TableStore,
      name: String,
      checkpoint: String,
      availableNow: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DrainConf.withDrainConf(batch.sparkSession) {
          admitBatch(batch.sparkSession, batch, batchId, store, name)
        }
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** Admission screen, served from committed state: per (arriving
    * video, stored video), the arrival-side containment at the INDEX'S
    * persisted budgets — [[Dedup.videoContainmentAgainst]] with the
    * manifest's parameters, the stored side a pinned 8-byte-per-frame
    * read. Callers aggregate to an admit/reject flag (q140's tail).
    *
    * @return (batch_id, stored_id, n_frames_batch, n_matched,
    *         containment ≥ stored min_containment) */
  def screen(
      spark: SparkSession,
      batchFrames: DataFrame,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val (m, _) = requireManifest(store, name)
    Dedup.videoContainmentAgainst(
      frameShape(batchFrames),
      servedFramesAt(spark, store, name, m),
      m.maxHamming, m.minContainment, maxBucketSize)
  }

  // --------------------------------------------------------------- supersede

  /** SUPERSEDE-AWARE admission — the video keeper: replace-the-clip-
    * with-the-full-cut, [[PerceptualIndex.admitKeepBestBatch]]'s
    * replace-if-better fold where "better" is STRUCTURAL containment
    * instead of a quality score ([[Dedup.videoContainmentDirected]]'s
    * two denominators decide both halves): an arriving video whose OWN
    * frames are within the containment budget of a stored video adds
    * nothing and rejects (the [[admitNovelBatch]] rule, unchanged); an
    * ADMITTED arrival that matches ≥ `min_containment` of a STORED
    * video's frames SUBSUMES it — the stored clip retires in the same
    * swap (the full cut a 2-frame clip was taken from replaces the
    * clip). Mutual containment (a re-encode: both directions ≥
    * threshold) rejects the arrival FIRST — ties keep the incumbent, and
    * a rejected arrival never retires anything. Partial overlaps admit
    * without retiring (shared intros are not subsumption). Everything —
    * retirements, admissions, the batchId — publishes in ONE swap.
    *
    * By default, in-batch containment BETWEEN arrivals is not screened
    * (micro-batch file boundaries decide what arrives together): a clip
    * and its full cut in ONE drain both admit, and the clip can never be
    * retired later (retirement only targets STORED items). `preDedupBatch
    * = true` opts into a within-batch directed-containment screen first —
    * contained batch videos die (mutual containment keeps the smallest
    * id; greedy, one pass — the [[PerceptualIndex.admitKeepBestBatch]]
    * semantics) before the stored-state fold.
    *
    * Cost shape: the screen is the banded batch-vs-stored containment
    * join; EVERY drain commits O(batch ∪ tombstones) — admissions are
    * linked frame appends, retirements land in the compaction-bounded
    * tombstone member every read subtracts, and past
    * `max(1 MiB, frames/8)` the tombstones ride the next drain into an
    * amortized base rewrite. Returns true when folded, false on replay. */
  def admitSupersedeBatch(
      spark: SparkSession,
      frames: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200,
      preDedupBatch: Boolean = false): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        supersedeStamped(spark, frames, store, name, Some(batchId),
          maxBucketSize, preDedupBatch)
      }
    }

  /** [[admitSupersedeBatch]] without the gate — the ad-hoc fold. */
  def supersede(
      spark: SparkSession,
      frames: DataFrame,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200,
      preDedupBatch: Boolean = false): Unit =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        supersedeStamped(spark, frames, store, name, None, maxBucketSize,
          preDedupBatch)
      }
      ()
    }

  /** Within-batch directed-containment losers (the opt-in face of
    * [[supersede]]'s `preDedupBatch`): a batch video CONTAINED in another
    * batch video dies — mutual containment keeps the SMALLEST id. GREEDY,
    * one pass: losses are not re-evaluated after a winner dies (a
    * containment chain in one burst keeps only its maximal members). */
  private def inBatchContainmentLosers(
      batch: DataFrame, maxHamming: Int, minContainment: Double,
      maxBucketSize: Int)(implicit caches: CacheScope): DataFrame =
    Dedup.videoContainmentDirected(batch, batch, maxHamming,
        minContainment, maxBucketSize)
      .filter(col("batch_id") =!= col("stored_id"))
      .select(
        when(col("containment_batch") >= minContainment &&
            (col("containment_stored") < minContainment ||
              col("batch_id") > col("stored_id")), col("batch_id"))
          .when(col("containment_stored") >= minContainment &&
            (col("containment_batch") < minContainment ||
              col("stored_id") > col("batch_id")), col("stored_id"))
          .as("id"))
      .filter(col("id").isNotNull).distinct()

  private def supersedeStamped(
      spark: SparkSession, frames: DataFrame,
      store: TableStore, name: String, stamp: Option[Long],
      maxBucketSize: Int, preDedupBatch: Boolean = false): Boolean = {
    val (m, mv) = requireManifest(store, name)
    requirePlain(m, name, "a supersede fold")
    if (stamp.exists(_ <= m.lastBatchId)) return false
    rollbackAll(store, name, m)
    val stored = servedFramesAt(spark, store, name, m)
    implicit val scope: CacheScope = new CacheScope
    // insert-only against BASE ids (⊇ retired ids until the fold) + the
    // in-batch (id, frame) canonicalization — appendStamped's contracts
    val batch0 = frameShape(frames)
      .join(store.snapshotAt(spark, framesTable(name), m.frames)
        .select(col("id")), Seq("id"), "left_anti")
      .groupBy(col("id"), col("frame")).agg(min(col("sig")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch =
      if (!preDedupBatch) batch0
      else scope.pin(batch0.join(
        broadcast(inBatchContainmentLosers(batch0, m.maxHamming,
          m.minContainment, maxBucketSize)), Seq("id"), "left_anti"))
    try {
      // both directed containments per (arrival, stored) pair at the
      // persisted budgets — rejection and subsumption from one screen
      val directed = Dedup.videoContainmentDirected(batch, stored,
          m.maxHamming, m.minContainment, maxBucketSize)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val rejected = directed
          .filter(col("containment_batch") >= m.minContainment)
          .select(col("batch_id").as("id")).distinct()
        val admitted = batch
          .join(broadcast(rejected), Seq("id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // stored videos subsumed by an ADMITTED arrival retire whole
          val removedIds = directed
            .filter(col("containment_stored") >= m.minContainment)
            .join(admitted.select(col("id").as("batch_id")).distinct(),
              Seq("batch_id"), "left_semi")
            .select(col("stored_id").as("id")).distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // fold-vs-tombstone on the PRE-batch tombstone size — the
            // PerceptualIndex.keepBestStamped policy on the frame family
            val rmFull = m.rmFrames.exists { pin =>
              store.byteSizeAt(rmTable(name), pin) > math.max(
                RmFloorBytes.toDouble,
                RmFrac * store.byteSizeAt(framesTable(name), m.frames))
            }
            val next =
              if (rmFull) {
                val fv = store.write(
                  stored.join(broadcast(removedIds), Seq("id"), "left_anti")
                    .unionByName(admitted),
                  framesTable(name), Some(m.frames))
                m.copy(frames = fv, rmFrames = None)
              } else {
                // frames append + tombstone merge are independent tables —
                // committed concurrently (the [[OverlayLock.inParallel]]
                // rationale)
                val rmEmpty = removedIds.isEmpty
                val results = OverlayLock.inParallel(Seq(
                  () => OverlayLock.appendOrCompact(store, framesTable(name),
                    m.frames,
                    store.snapshotAt(spark, framesTable(name), m.frames),
                    admitted)) ++
                  (if (rmEmpty) Seq.empty
                   else Seq(() => m.rmFrames match {
                     case Some(p) => store.write(
                       store.snapshotAt(spark, rmTable(name), p)
                         .select(col("id"))
                         .unionByName(removedIds).distinct().coalesce(4),
                       rmTable(name), Some(p))
                     case None => store.write(removedIds.coalesce(4),
                       rmTable(name), store.currentVersion(rmTable(name)))
                   })))
                val rv = if (rmEmpty) m.rmFrames
                  else Some(results.last.asInstanceOf[Int])
                m.copy(frames = results.head.asInstanceOf[Int], rmFrames = rv)
              }
            commitManifest(store, name,
              next.copy(lastBatchId = stamp.getOrElse(m.lastBatchId)),
              Some(mv))
            true
          } finally removedIds.unpersist()
        } finally admitted.unpersist()
      } finally directed.unpersist()
    } finally { batch0.unpersist(); scope.release() }
  }

  /** [[admitSupersedeBatch]] as a live sink — the video keeper loop.
    * `preDedupBatch` as in [[admitSupersedeBatch]]. */
  def admitSupersedeStream(
      stream: DataFrame,
      store: TableStore,
      name: String,
      checkpoint: String,
      availableNow: Boolean = true,
      preDedupBatch: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DrainConf.withDrainConf(batch.sparkSession) {
          admitSupersedeBatch(batch.sparkSession, batch, batchId, store, name,
            preDedupBatch = preDedupBatch)
        }
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  // ------------------------------------------------------------------ keeper

  /** KEEPER-AWARE admission for the frame family —
    * [[PerceptualIndex.admitKeepBestBatch]]'s replace-if-better fold
    * where the match evidence is STRUCTURAL containment
    * ([[Dedup.videoContainmentDirected]]'s two denominators) and the
    * tiebreak is a quality score (decoded resolution, bitrate — the
    * higher-resolution re-encode of the same cut replaces it):
    *
    *  - MUTUAL containment (a re-encode: both directions ≥ the pinned
    *    threshold): the arrival admits iff its quality STRICTLY exceeds
    *    every such match's — and then retires them all in the same swap;
    *    worse or equal copies reject (ties keep the incumbent);
    *  - arrival strictly CONTAINED in a stored video (a clip, not
    *    mutual): rejects regardless of quality — a higher-quality CLIP
    *    never displaces the full cut it was taken from;
    *  - arrival SUBSUMES a stored video (the [[admitSupersedeBatch]]
    *    rule): admits and retires it;
    *  - partial overlaps admit without retiring.
    *
    * Same contracts as the supersede face: insert-only by id, in-batch
    * (id, frame) canonicalization (quality ties to the max per id),
    * O(batch ∪ tombstones) commits, the batchId gate in one swap.
    * In-batch containment between arrivals is not screened (the
    * documented [[admitSupersedeBatch]] hole — route bursts through its
    * `preDedupBatch` first if needed). Returns true when folded, false
    * on replay. */
  def admitKeepBestBatch(
      spark: SparkSession,
      frames: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        keepBestStamped(spark, frames, store, name, Some(batchId), maxBucketSize)
      }
    }

  /** [[admitKeepBestBatch]] without the gate — the ad-hoc fold. */
  def keepBest(
      spark: SparkSession,
      frames: DataFrame,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200): Unit =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        keepBestStamped(spark, frames, store, name, None, maxBucketSize)
      }
      ()
    }

  private def keepBestStamped(
      spark: SparkSession, frames: DataFrame,
      store: TableStore, name: String, stamp: Option[Long],
      maxBucketSize: Int): Boolean = {
    val (m, mv) = requireManifest(store, name)
    requireQuality(m, name, "a replace-if-better fold")
    if (stamp.exists(_ <= m.lastBatchId)) return false
    rollbackAll(store, name, m)
    val stored = servedFramesAt(spark, store, name, m)
    implicit val scope: CacheScope = new CacheScope
    // insert-only against BASE ids + in-batch (id, frame) canonicalization
    // (min sig; quality folds to the max per id — one score per video)
    val batch = frameQualityShape(frames)
      .join(store.snapshotAt(spark, framesTable(name), m.frames)
        .select(col("id")), Seq("id"), "left_anti")
      .groupBy(col("id"), col("frame"))
      .agg(min(col("sig")).as("sig"), max(col("q")).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchQ = batch.groupBy(col("id")).agg(max(col("q")).as("_qb"))
      val storedQ = stored.groupBy(col("id")).agg(max(col("q")).as("_qs"))
      // both directed containments per (arrival, stored) pair, at the
      // persisted budgets, quality joined on both sides
      val directed = Dedup.videoContainmentDirected(
          batch.select(col("id"), col("frame"), col("sig")),
          stored.select(col("id"), col("frame"), col("sig")),
          m.maxHamming, m.minContainment, maxBucketSize)
        .join(batchQ.withColumnRenamed("id", "batch_id"), Seq("batch_id"))
        .join(storedQ.withColumnRenamed("id", "stored_id"), Seq("stored_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val t = m.minContainment
        // reject iff ∃ match: the arrival is contained AND NOT (mutual
        // with strictly better quality)
        val rejected = directed
          .filter(col("containment_batch") >= t &&
            (col("containment_stored") < t || col("_qb") <= col("_qs")))
          .select(col("batch_id").as("id")).distinct()
        val admitted = batch
          .join(broadcast(rejected), Seq("id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // an admitted arrival retires every stored video it covers —
          // the beaten mutual matches AND the subsumed clips
          val removedIds = directed
            .filter(col("containment_stored") >= t)
            .join(admitted.select(col("id").as("batch_id")).distinct(),
              Seq("batch_id"), "left_semi")
            .select(col("stored_id").as("id")).distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val rmFull = m.rmFrames.exists { pin =>
              store.byteSizeAt(rmTable(name), pin) > math.max(
                RmFloorBytes.toDouble,
                RmFrac * store.byteSizeAt(framesTable(name), m.frames))
            }
            val next =
              if (rmFull) {
                val fv = store.write(
                  stored.join(broadcast(removedIds), Seq("id"), "left_anti")
                    .unionByName(admitted),
                  framesTable(name), Some(m.frames))
                m.copy(frames = fv, rmFrames = None)
              } else {
                // frames append + tombstone merge are independent tables —
                // committed concurrently (the [[OverlayLock.inParallel]]
                // rationale)
                val rmEmpty = removedIds.isEmpty
                val results = OverlayLock.inParallel(Seq(
                  () => OverlayLock.appendOrCompact(store, framesTable(name),
                    m.frames,
                    store.snapshotAt(spark, framesTable(name), m.frames),
                    admitted)) ++
                  (if (rmEmpty) Seq.empty
                   else Seq(() => m.rmFrames match {
                     case Some(p) => store.write(
                       store.snapshotAt(spark, rmTable(name), p)
                         .select(col("id"))
                         .unionByName(removedIds).distinct().coalesce(4),
                       rmTable(name), Some(p))
                     case None => store.write(removedIds.coalesce(4),
                       rmTable(name), store.currentVersion(rmTable(name)))
                   })))
                val rv = if (rmEmpty) m.rmFrames
                  else Some(results.last.asInstanceOf[Int])
                m.copy(frames = results.head.asInstanceOf[Int], rmFrames = rv)
              }
            commitManifest(store, name,
              next.copy(lastBatchId = stamp.getOrElse(m.lastBatchId)),
              Some(mv))
            true
          } finally removedIds.unpersist()
        } finally admitted.unpersist()
      } finally directed.unpersist()
    } finally { batch.unpersist(); scope.release() }
  }

  /** [[admitKeepBestBatch]] as a live sink — the video quality-keeper
    * loop. */
  def admitKeepBestStream(
      stream: DataFrame,
      store: TableStore,
      name: String,
      checkpoint: String,
      availableNow: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DrainConf.withDrainConf(batch.sparkSession) {
          admitKeepBestBatch(batch.sparkSession, batch, batchId, store, name)
        }
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }
}
