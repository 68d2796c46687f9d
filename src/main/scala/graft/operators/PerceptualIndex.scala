package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted 64-bit perceptual-signature index — the pixel/audio-side
  * analogue of [[SignatureIndex]] (reference discipline: incremental
  * state maintenance, control_migration_schema_script.sql:244, 412–416):
  * decode and hash each media item ONCE ([[Multimodal.dHashes]],
  * [[Multimodal.audioFingerprints]] — any 64-bit family), persist the
  * `(id, sig)` projection, then screen every arriving batch against
  * committed state without ever re-decoding the corpus. Stored state is
  * 8 bytes per item, so a billion-item corpus screens from a
  * single-digit-GB table while the payload bytes stay wherever they
  * live.
  *
  * Storage (the [[IvfIndex]]/[[CorpusProfile]] manifest discipline,
  * fourth instance):
  *  - `<name>_sigs` — `(id, sig: long)`, the indexed corpus;
  *  - `<name>_manifest` — one file pinning the sigs version, carrying
  *    the SCREENING PARAMETER (`max_hamming` — the banding geometry
  *    derives from it, so every screen uses the model's own budget
  *    rather than trusting callers to repeat it) and the streaming
  *    admission gate's `last_batch_id`. Mutations commit the member
  *    first (an invisible orphan) and swap the manifest once; a crash
  *    anywhere before the swap is invisible and the redelivered batch
  *    folds exactly once ([[admitBatch]]).
  *
  * The daily admission loop, for pixels:
  * {{{
  * val matches = PerceptualIndex.screen(spark, batchSigs, store, "imgs")
  * val novel = batchSigs.join(broadcast(matches.select(col("batch_id").as("id"))
  *   .distinct()), Seq("id"), "left_anti")
  * PerceptualIndex.append(spark, novel, store, "imgs")
  * }}}
  *
  * Scale shape: [[append]] commits ONLY the batch's 8-byte rows (linked
  * members, [[OverlayLock.appendOrCompact]]); [[screen]] is the
  * chunk-band pigeonhole equi-join of [[Dedup.hammingBandedPairsAgainst]]
  * — batch-proportional work against a narrow projection of constant
  * serving state, hot buckets capped on both sides.
  */
object PerceptualIndex {

  private def sigsTable(name: String) = s"${name}_sigs"
  // tombstone member (KEEPER families): ids whose base rows are retired by
  // replace-if-better folds — the read-time subtraction that keeps a
  // replacement drain from rewriting the whole sigs member (the
  // [[IvfIndex]]/[[PostingsIndex]] revision-overlay discipline, reduced to
  // its removal half: replacements INSERT under new ids, so no shadow rows
  // are needed, only retirements)
  private def rmTable(name: String) = s"${name}_rm"
  private def manifestTable(name: String) = s"${name}_manifest"
  private val manifestFile = "manifest.json"

  /** Tombstone-compaction policy — [[IvfIndex.OvlFrac]]'s rationale on
    * the retired-id set's bytes vs the sigs member's. */
  private val RmFloorBytes: Long = IvfIndex.OvlFloorBytes
  private val RmFrac: Double = IvfIndex.OvlFrac

  /** Sigs pin + the screening budget + the admission gate. `hasQuality`
    * marks a KEEPER family ([[buildWithQuality]]): the sigs member
    * carries a per-item quality column and mutates through
    * [[admitKeepBestBatch]]'s replace-if-better fold — the two layouts
    * never mix (plain folds on a quality index, or vice versa, fail
    * loudly instead of corrupting the member schema). */
  private[graft] final case class PercManifest(
      sigs: Int, maxHamming: Int, lastBatchId: Long = -1L,
      hasQuality: Boolean = false, rmSigs: Option[Int] = None)

  private def encodeManifest(m: PercManifest): String =
    s"""{"sigs_v":${m.sigs},"max_hamming":${m.maxHamming},""" +
      s""""has_quality":${if (m.hasQuality) 1 else 0},""" +
      s""""rm_sigs_v":${m.rmSigs.getOrElse(-1)},""" +
      s""""last_batch_id":${m.lastBatchId}}"""

  private def decodeManifest(s: String): PercManifest = {
    def field(k: String): Long = {
      val i = s.indexOf("\"" + k + "\":")
      require(i >= 0, s"perceptual-index manifest missing $k: $s")
      val from = i + k.length + 3
      val end = s.indexWhere(c => c == ',' || c == '}', from)
      s.substring(from, end).trim.toLong
    }
    // absent = pre-quality/pre-tombstone manifest (older persisted index)
    def optAbsent(k: String): Option[Int] =
      if (s.indexOf("\"" + k + "\":") < 0) None
      else { val v = field(k); if (v < 0) None else Some(v.toInt) }
    val hasQ = s.indexOf("\"has_quality\":") >= 0 && field("has_quality") != 0L
    PercManifest(field("sigs_v").toInt, field("max_hamming").toInt,
      field("last_batch_id"), hasQ, optAbsent("rm_sigs_v"))
  }

  private[graft] def readManifest(
      store: TableStore, name: String): Option[(PercManifest, Int)] =
    store.currentVersion(manifestTable(name)).map { v =>
      val f = java.nio.file.Paths.get(store.pathAt(manifestTable(name), v))
        .resolve(manifestFile)
      (decodeManifest(new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)), v)
    }

  private def requireManifest(store: TableStore, name: String): (PercManifest, Int) =
    readManifest(store, name).getOrElse(throw new IllegalStateException(
      s"perceptual index $name has no manifest — build it first"))

  private def commitManifest(
      store: TableStore, name: String, m: PercManifest, expected: Option[Int]): Unit =
    store.commitFile(manifestTable(name), manifestFile,
      encodeManifest(m).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      expected)

  private def withLock[A](store: TableStore, name: String)(body: => A): A =
    OverlayLock.withLock(store, "perc", name)(body)

  private def rollbackAll(store: TableStore, name: String, m: PercManifest): Unit = {
    OverlayLock.rollbackIfAhead(store, sigsTable(name), m.sigs)
    m.rmSigs.foreach(OverlayLock.rollbackIfAhead(store, rmTable(name), _))
  }

  /** The SERVED signature corpus: base ∖ tombstoned ids (a keeper fold's
    * retirements — their base rows stay in the files until the amortized
    * fold). The tombstone set is compaction-bounded, so it broadcasts
    * into the anti-join; plain families have no pin and read the base
    * directly. */
  private def servedSigsAt(
      spark: SparkSession, store: TableStore, name: String,
      m: PercManifest): DataFrame = {
    val base = store.snapshotAt(spark, sigsTable(name), m.sigs)
    m.rmSigs match {
      case None => base
      case Some(pin) => base.join(broadcast(
          store.snapshotAt(spark, rmTable(name), pin).select(col("id"))),
        Seq("id"), "left_anti")
    }
  }

  private def sigShape(sigs: DataFrame): DataFrame = {
    val Seq(idc, sigc) = sigs.columns.take(2).toSeq
    sigs.select(col(idc).as("id"), col(sigc).cast("long").as("sig"))
  }

  /** `(id, sig, q)` of a quality-carrying frame (first three columns,
    * any names). */
  private def sigQualityShape(sigs: DataFrame): DataFrame = {
    val Seq(idc, sigc, qc) = sigs.columns.take(3).toSeq
    sigs.select(col(idc).as("id"), col(sigc).cast("long").as("sig"),
      col(qc).cast("double").as("q"))
  }

  private def requirePlain(m: PercManifest, name: String, op: String): Unit =
    require(!m.hasQuality,
      s"perceptual index $name is a KEEPER family (quality-carrying) — " +
        s"$op would drop its quality column; use admitKeepBestBatch/Stream")

  private def requireQuality(m: PercManifest, name: String, op: String): Unit =
    require(m.hasQuality,
      s"perceptual index $name is a plain family — $op needs a " +
        "quality-carrying index; build it with buildWithQuality")

  // ------------------------------------------------------------------ build

  /** Persist `(id, sig)` rows (first two columns, any names) and the
    * screening budget. Rebuilding replaces the corpus; the admission
    * gate survives, as in every family here. */
  def build(
      sigs: DataFrame,
      maxHamming: Int,
      store: TableStore,
      name: String): Unit = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        val prev = readManifest(store, name)
        prev.foreach { case (m, _) => rollbackAll(store, name, m) }
        val sv = store.write(sigShape(sigs), sigsTable(name))
        commitManifest(store, name,
          PercManifest(sv, maxHamming,
            prev.map(_._1.lastBatchId).getOrElse(-1L)), prev.map(_._2))
      }
    }
  }

  /** [[build]] for a KEEPER family: persist `(id, sig, quality)` rows
    * (first three columns, any names) — the quality score is whatever
    * the pipeline's keeper rule ranks by (decoded width×height for
    * images, the q137 RefinedWeb rule) and rides IN the member, so the
    * replace-if-better fold ([[admitKeepBestBatch]]) compares arrivals
    * against stored quality without re-decoding anything. */
  def buildWithQuality(
      sigs: DataFrame,
      maxHamming: Int,
      store: TableStore,
      name: String): Unit = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        val prev = readManifest(store, name)
        prev.foreach { case (m, _) => rollbackAll(store, name, m) }
        val sv = store.write(sigQualityShape(sigs), sigsTable(name))
        commitManifest(store, name,
          PercManifest(sv, maxHamming,
            prev.map(_._1.lastBatchId).getOrElse(-1L), hasQuality = true),
          prev.map(_._2))
      }
    }
  }

  /** The indexed `(id, sig)` corpus — `(id, sig, q)` for a keeper
    * family (manifest-pinned read). */
  def signatures(spark: SparkSession, store: TableStore, name: String): DataFrame = {
    val (m, _) = requireManifest(store, name)
    servedSigsAt(spark, store, name, m)
  }

  /** The index's screening budget, as persisted. */
  def maxHamming(store: TableStore, name: String): Int =
    requireManifest(store, name)._1.maxHamming

  // ---------------------------------------------------------- append/remove

  /** Fold a signature batch into committed state — INSERT-ONLY by id
    * (re-sent ids are no-ops), O(batch) linked member commit
    * ([[OverlayLock.appendOrCompact]]), one manifest swap. */
  def append(
      spark: SparkSession,
      sigs: DataFrame,
      store: TableStore,
      name: String): Unit =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        appendStamped(spark, sigs, store, name, None)
      }
      ()
    }

  private def appendStamped(
      spark: SparkSession, sigs: DataFrame,
      store: TableStore, name: String, stamp: Option[Long],
      screenFirst: Boolean = false,
      maxBucketSize: Int = 200,
      preDedupBatch: Boolean = false): Boolean = {
    val (m, mv) = requireManifest(store, name)
    requirePlain(m, name, "an insert-only fold")
    if (stamp.exists(_ <= m.lastBatchId)) return false
    rollbackAll(store, name, m)
    val stored = servedSigsAt(spark, store, name, m)
    // the screen-then-admit fold: drop batch items within the persisted
    // budget of ANY stored signature, admit the rest — both halves read
    // the SAME pinned stored version, so the loop is one atomic decision
    val batch0 = sigShape(sigs)
    val batch =
      if (!screenFirst) batch0
      else {
        implicit val scope: CacheScope = new CacheScope
        try {
          // opt-in WITHIN-BATCH screen (closes the documented in-batch
          // hole): a burst of near-copies inside one drain collapses to
          // its smallest-id member — greedy keeper over the pair graph,
          // any item within budget of a smaller-id batch item dies —
          // before the stored-state screen decides the survivors
          val preDeduped =
            if (!preDedupBatch) batch0
            else batch0.join(broadcast(
                Dedup.hammingBandedPairs(batch0, m.maxHamming, maxBucketSize)
                  .select(col("b_id").as("id")).distinct()),
              Seq("id"), "left_anti")
          val dup = Dedup.hammingBandedPairsAgainst(preDeduped, stored,
              m.maxHamming, maxBucketSize)
            .select(col("batch_id").as("id")).distinct()
          // materialize the survivor list before the scope's pins release
          val novel = preDeduped.join(broadcast(dup), Seq("id"), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          novel.count()
          novel
        } finally scope.release()
      }
    try {
      val fresh = batch
        .join(stored.select(col("id")), Seq("id"), "left_anti")
        // at most one signature per id: a batch carrying an id twice (two
        // staged files in one trigger) indexes the smallest sig —
        // deterministic under any partitioning (the
        // PostingsIndex.tokenized canonicalization rationale; signatures
        // order directly, no digest needed)
        .groupBy(col("id")).agg(min(col("sig")).as("sig"))
      val sv = OverlayLock.appendOrCompact(store, sigsTable(name), m.sigs,
        stored, fresh)
      commitManifest(store, name,
        m.copy(sigs = sv, lastBatchId = stamp.getOrElse(m.lastBatchId)), Some(mv))
      true
    } finally if (screenFirst) batch.unpersist()
  }

  /** Takedown: next sigs version without the given ids — after removal a
    * future arrival resembling only the removed items is admitted again
    * (the screen's memory genuinely forgets). Returns rows removed. */
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
        // the takedown rewrite serves double duty: the SERVED view minus
        // the dropped ids folds any keeper tombstones into the base, and
        // the swap clears the pin
        val stored = servedSigsAt(spark, store, name, m)
        val kept = stored.join(drop, stored("id") === col("_rm_id"), "left_anti")
        val before = stored.count()
        val keptN = kept.count()
        val sv = store.write(kept, sigsTable(name), Some(m.sigs))
        commitManifest(store, name, m.copy(sigs = sv, rmSigs = None), Some(mv))
        before - keptN
      }
    }

  // --------------------------------------------------------------- admission

  /** Exactly-once micro-batch admission ([[CorpusProfile.admitBatch]]'s
    * gate): the sigs advance and the batchId record are one atomic swap,
    * so a crash mid-fold is invisible and the redelivered batch folds
    * exactly once. Returns true when folded, false when replayed. */
  def admitBatch(
      spark: SparkSession,
      sigs: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        appendStamped(spark, sigs, store, name, Some(batchId))
      }
    }

  /** The daily loop as ONE exactly-once fold: SCREEN the batch against
    * committed state (the persisted budget), admit only the novel items,
    * record the batchId — all against the same pinned sigs version and
    * published by one swap. The stored set EVOLVES between batches: a
    * near-copy of an item admitted two drains ago is rejected by that
    * admission, which the separate screen-then-append calls only get if
    * the caller sequences them; here the gate enforces it. By default,
    * in-batch near-dups of EACH OTHER both admit (the screen is against
    * stored state); `preDedupBatch = true` opts into a within-batch
    * screen first — a burst of near-copies of one novel item collapses
    * to its smallest-id member (greedy keeper over the
    * [[Dedup.hammingBandedPairs]] graph) before the stored screen runs.
    * GREEDY means ONE PASS: losses are not re-evaluated after a winner
    * dies, so in a chain A(1)~B(2), B~C(3) with A far from C, both B
    * and C die and only A survives — the kept set is not a maximal
    * independent set of the near-dup graph (sequential one-item folds
    * would keep A and C). Acceptable for the burst case this exists
    * for; callers needing maximality sequence their drains.
    * Returns true when folded, false on replay. */
  def admitNovelBatch(
      spark: SparkSession,
      sigs: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200,
      preDedupBatch: Boolean = false): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        appendStamped(spark, sigs, store, name, Some(batchId),
          screenFirst = true, maxBucketSize = maxBucketSize,
          preDedupBatch = preDedupBatch)
      }
    }

  /** [[admitStream]] with the screen-then-admit fold — the admission
    * loop as a live sink. `preDedupBatch` as in [[admitNovelBatch]]. */
  def admitNovelStream(
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
          admitNovelBatch(batch.sparkSession, batch, batchId, store, name,
            preDedupBatch = preDedupBatch)
        }
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** KEEPER-AWARE admission — replace-if-better, the composition of
    * q137's keeper rule with the admission gate that the separate
    * operators couldn't give (a manual remove + admit is two commit
    * points and a reader-visible window): screen the arriving
    * `(id, sig, quality)` batch against the pinned stored state; an
    * arrival admits iff it matches NOTHING within the budget (novel) or
    * its quality STRICTLY exceeds every matched stored item's — and an
    * admitted arrival REPLACES all its matched stored rows (the
    * higher-resolution re-crawl of a stored image supersedes it, the
    * RefinedWeb pixels rule applied at the gate). Worse or equal copies
    * reject; ties keep the incumbent. Everything — removals, admissions,
    * the batchId — publishes in ONE swap.
    *
    * In-batch id duplicates fold to the (highest-quality, then
    * smallest-sig) row; re-sent EXISTING ids are no-ops (the [[append]]
    * insert-only contract — re-crawls arrive under fresh ids); in-batch
    * near-dups of each other both admit by default (the
    * [[admitNovelBatch]] contract) — `preDedupBatch = true` opts into a
    * within-batch keeper screen first, so a burst of near-copies of one
    * novel item admits only its highest-quality member (ties to the
    * smallest id; greedy ONE PASS — in a quality-ordered chain A(q9)~
    * B(q10), B~C(q11) with A far from C, both A and B die and only C
    * admits, where sequential folds would keep A: the kept set is not a
    * maximal independent set, the [[admitNovelBatch]] caveat).
    * Cost shape: the screen is the banded batch-vs-stored
    * join; EVERY drain commits O(batch ∪ tombstones) — admissions are
    * linked appends to the base, retirements land in the compaction-
    * bounded tombstone member that every read subtracts
    * (base ∖ retired ids), and past `max(1 MiB, base/8)` the
    * tombstones ride the next drain into an amortized base rewrite —
    * the [[IvfIndex]] revision-overlay discipline reduced to its
    * removal half, since replacements insert under NEW ids and need no
    * shadow rows. Returns true when folded, false on replay. */
  def admitKeepBestBatch(
      spark: SparkSession,
      sigs: DataFrame,
      batchId: Long,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200,
      preDedupBatch: Boolean = false): Boolean =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        keepBestStamped(spark, sigs, store, name, Some(batchId), maxBucketSize,
          preDedupBatch)
      }
    }

  /** [[admitKeepBestBatch]] without the gate — the ad-hoc fold. */
  def keepBest(
      spark: SparkSession,
      sigs: DataFrame,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200,
      preDedupBatch: Boolean = false): Unit =
    withLock(store, name) {
      OverlayLock.retryOnConflict() {
        keepBestStamped(spark, sigs, store, name, None, maxBucketSize,
          preDedupBatch)
      }
      ()
    }

  private def keepBestStamped(
      spark: SparkSession, sigs: DataFrame,
      store: TableStore, name: String, stamp: Option[Long],
      maxBucketSize: Int, preDedupBatch: Boolean = false): Boolean = {
    val (m, mv) = requireManifest(store, name)
    requireQuality(m, name, "a replace-if-better fold")
    if (stamp.exists(_ <= m.lastBatchId)) return false
    rollbackAll(store, name, m)
    val stored = servedSigsAt(spark, store, name, m)
    implicit val scope: CacheScope = new CacheScope
    // in-batch id duplicates: highest quality wins, ties to smallest sig
    // (deterministic under any partitioning); a re-sent EXISTING id is a
    // no-op whole — the insert-only contract, which also keeps a
    // tombstoned id from re-entering the base under its own name and
    // being silently hidden by the subtraction (base ids ⊇ retired ids
    // until the fold, so one anti-join covers both)
    val batch0 = sigQualityShape(sigs)
      .join(store.snapshotAt(spark, sigsTable(name), m.sigs).select(col("id")),
        Seq("id"), "left_anti")
      .groupBy(col("id"))
      .agg(min_by(struct(col("sig"), col("q")),
        struct(-col("q"), col("sig"))).as("_w"))
      .select(col("id"), col("_w.sig").as("sig"), col("_w.q").as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // opt-in WITHIN-BATCH keeper ([[admitNovelBatch]]'s preDedupBatch
    // with the quality rule): in a burst carrying several near-copies
    // of one NOVEL item, any member within budget of a strictly-better
    // batch item — or of an equal-quality smaller-id one — dies before
    // the stored-state fold, so the burst admits only its best copy
    val batch =
      if (!preDedupBatch) batch0
      else {
        val pairs = Dedup.hammingBandedPairs(
          batch0.select(col("id"), col("sig")), m.maxHamming, maxBucketSize)
        val q = batch0.select(col("id"), col("q"))
        val losers = pairs
          .join(q.select(col("id").as("a_id"), col("q").as("_qa")), Seq("a_id"))
          .join(q.select(col("id").as("b_id"), col("q").as("_qb")), Seq("b_id"))
          .select(when(col("_qa") < col("_qb"), col("a_id"))
            .otherwise(col("b_id")).as("id")).distinct()
        batch0.join(broadcast(losers), Seq("id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    try {
      // every (arrival, stored) pair within the persisted budget, scored
      val scored = Dedup.hammingBandedPairsAgainst(
          batch.select(col("id"), col("sig")), stored,
          m.maxHamming, maxBucketSize)
        .join(stored.select(col("id").as("stored_id"), col("q").as("_sq")),
          Seq("stored_id"))
      // admit iff no match holds quality >= the arrival's
      val admitted = batch
        .join(scored.groupBy(col("batch_id")).agg(max(col("_sq")).as("_best"))
          .withColumnRenamed("batch_id", "id"), Seq("id"), "left")
        .filter(col("_best").isNull || col("q") > col("_best"))
        .select(col("id"), col("sig"), col("q"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // an admitted arrival beat ALL its matches — they all retire
        val removedIds = scored
          .join(admitted.select(col("id").as("batch_id")), Seq("batch_id"),
            "left_semi")
          .select(col("stored_id").as("id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // fold-vs-tombstone on the PRE-batch tombstone size (file-
          // metadata reads) — the IvfIndex.upsertStamped policy on the
          // retired-id set
          val rmFull = m.rmSigs.exists { pin =>
            store.byteSizeAt(rmTable(name), pin) > math.max(
              RmFloorBytes.toDouble,
              RmFrac * store.byteSizeAt(sigsTable(name), m.sigs))
          }
          val next =
            if (rmFull) {
              // amortized fold: the served view minus this batch's
              // retirements plus its admissions, tombstone pin cleared
              val sv = store.write(
                stored.join(broadcast(removedIds), Seq("id"), "left_anti")
                  .unionByName(admitted),
                sigsTable(name), Some(m.sigs))
              m.copy(sigs = sv, rmSigs = None)
            } else {
              // O(batch ∪ tombstones): admissions link-append to the
              // BASE (insert-only ids never collide with retired rows
              // still in the files), retirements merge into the small
              // tombstone member
              val sv = OverlayLock.appendOrCompact(store, sigsTable(name),
                m.sigs,
                store.snapshotAt(spark, sigsTable(name), m.sigs), admitted)
              val rv =
                if (removedIds.isEmpty) m.rmSigs
                else Some(m.rmSigs match {
                  case Some(p) => store.write(
                    store.snapshotAt(spark, rmTable(name), p)
                      .select(col("id"))
                      .unionByName(removedIds).distinct().coalesce(4),
                    rmTable(name), Some(p))
                  case None => store.write(removedIds.coalesce(4),
                    rmTable(name), store.currentVersion(rmTable(name)))
                })
              m.copy(sigs = sv, rmSigs = rv)
            }
          commitManifest(store, name,
            next.copy(lastBatchId = stamp.getOrElse(m.lastBatchId)),
            Some(mv))
          true
        } finally removedIds.unpersist()
      } finally admitted.unpersist()
    } finally {
      if (preDedupBatch) batch.unpersist()
      batch0.unpersist(); scope.release()
    }
  }

  /** [[admitKeepBestBatch]] as a live sink — the keeper admission loop.
    * `preDedupBatch` as in [[admitKeepBestBatch]]. */
  def admitKeepBestStream(
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
          admitKeepBestBatch(batch.sparkSession, batch, batchId, store, name,
            preDedupBatch = preDedupBatch)
        }
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** Streaming admission: the perceptual index as a live sink (the same
    * face as [[IvfIndex.admitStream]], for the signature tier). */
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

  /** Admission screen, served from committed state: every (batch item,
    * stored item) pair within the INDEX'S hamming budget —
    * [[Dedup.hammingBandedPairsAgainst]] with the persisted parameter,
    * the stored side a manifest-pinned 8-byte-per-item read. Callers
    * aggregate to an admit/reject flag or a match count (q130's tail).
    *
    * @return (batch_id, stored_id, hamming ≤ stored max_hamming) */
  def screen(
      spark: SparkSession,
      batchSigs: DataFrame,
      store: TableStore,
      name: String,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val (m, _) = requireManifest(store, name)
    Dedup.hammingBandedPairsAgainst(
      sigShape(batchSigs),
      servedSigsAt(spark, store, name, m),
      m.maxHamming, maxBucketSize)
  }
}
