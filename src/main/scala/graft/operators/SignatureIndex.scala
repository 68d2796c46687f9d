package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Persisted MinHash signature index — the TEXT-side analogue of
  * [[IvfIndex]] and the incremental form of [[Dedup.dedupAgainst]]: shingle
  * and hash the corpus ONCE, persist the signatures, then screen every
  * arriving batch against stored state without ever re-reading the corpus
  * text. [[Dedup.dedupAgainst]] recomputes the corpus signatures per call —
  * right for one-off jobs; at a daily admission cadence over a 100 TB
  * corpus the text re-scan dominates, and this index removes it (stored
  * signatures are ~numHashes longs per doc — ~1 KB against tens of KB of
  * text — and banding them back into buckets is a narrow projection).
  *
  * Storage (versioned [[TableStore]] tables, atomic swap, CAS-protected):
  *  - `<name>_sigs` — `(id, sig: array<long>)`, the indexed corpus;
  *  - `<name>_params` — one row `(shingle_n, num_hashes, bands)`: screening
  *    MUST hash the batch with the model's own parameters, so they travel
  *    with the index instead of trusting every caller to repeat them.
  *
  * The admission loop a corpus pipeline runs daily:
  * {{{
  * val kept = SignatureIndex.screen(spark, arriving, "id", "text", store, "corpus", 0.8)
  * // ... write `kept` to the corpus table ...
  * SignatureIndex.append(spark, kept, "id", "text", store, "corpus")
  * }}}
  */
object SignatureIndex {

  private def sigsTable(name: String) = s"${name}_sigs"
  private def paramsTable(name: String) = s"${name}_params"

  final case class Params(shingleN: Int, numHashes: Int, bands: Int) {
    require(numHashes % bands == 0, s"numHashes=$numHashes must divide into bands=$bands")
  }

  private def signaturesOf(df: DataFrame, idCol: String, textCol: String, p: Params) =
    df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), p.shingleN, p.numHashes).as("sig"),
        // distinct-shingle count (one pass, same hashed-shingle set the
        // signature minimizes over): the containment estimator's
        // denominators ride WITH the signature, so the directed screen
        // never re-reads text — hash-collision parity with counting
        // distinct shingle strings is the q23 argument (~2⁻⁶⁴)
        size(hashedShingleSet(col(textCol), p.shingleN)).cast("long").as("n_sh"))
      .filter(size(col("sig")) > 0) // docs long enough to shingle

  /** Shingle+hash `df` once and persist signatures + parameters. */
  def build(
      df: DataFrame,
      idCol: String,
      textCol: String,
      p: Params,
      store: TableStore,
      name: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    store.write(signaturesOf(df, idCol, textCol, p), sigsTable(name))
    store.write(Seq((p.shingleN, p.numHashes, p.bands))
      .toDF("shingle_n", "num_hashes", "bands"), paramsTable(name))
  }

  def params(spark: SparkSession, store: TableStore, name: String): Params = {
    val r = store.read(spark, paramsTable(name)).head()
    Params(r.getAs[Int]("shingle_n"), r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"))
  }

  /** The SERVED `(id, sig, n_sh)` corpus signatures: base rows minus any
    * id a supersede fold has tombstoned. Markers are ROWS IN THE SIGS
    * TABLE ITSELF (`n_sh < 0`, empty signature) — the single-table
    * reduction of the [[PerceptualIndex]] tombstone member: retirements
    * and admissions commit in ONE appendRows version, so atomicity needs
    * no manifest, and the markers ride until an amortized fold (the next
    * oversized supersede, a takedown, or a rebuild) rewrites them away.
    * A pre-containment index (no `n_sh` column) serves raw. */
  def signatures(spark: SparkSession, store: TableStore, name: String): DataFrame =
    servedOf(store.read(spark, sigsTable(name)))

  /** Base ∖ tombstoned ids. The marker set is fold-bounded (small), so
    * it broadcasts into the anti-join; the anti-join drops the marker
    * rows themselves along with the rows they retire. */
  private def servedOf(raw: DataFrame): DataFrame =
    if (!raw.columns.contains("n_sh")) raw
    else raw.join(broadcast(raw.filter(col("n_sh") < 0).select(col("id"))),
      Seq("id"), "left_anti")

  /** Hash an admitted batch with the STORED parameters and commit the
    * NEW signatures as the next version — the model (params) is
    * untouched, mirroring [[IvfIndex.append]]. IDEMPOTENT by id: ids
    * already indexed are skipped, so a replayed micro-batch (the
    * foreachBatch at-least-once contract) never double-inserts.
    *
    * O(batch) linked commit ([[TableStore.appendRows]]): only the fresh
    * rows are written, the snapshot version's part files carry as hard
    * links — a billion-doc signature tier is never rewritten to admit a
    * micro-batch (it WAS, until late r16: the union-rewrite here was the
    * one per-drain corpus-sized write left in the admission family).
    * [[compact]] bounds the resulting file-count creep, and
    * [[graft.streaming.AdmissionStream]] already runs it per drain. */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      name: String): Unit = {
    val p = params(spark, store, name)
    // snapshot: the append CASes against the version the screen derived from
    val (existing, readVersion) = store.snapshot(spark, sigsTable(name))
    require(existing.columns.contains("n_sh"),
      "stored signatures carry no n_sh column (pre-containment index) — " +
        "rebuild the index before appending")
    store.appendRows(
      signaturesOf(batch, idCol, textCol, p)
        .join(existing.select(col("id")), Seq("id"), "left_anti"),
      sigsTable(name), readVersion)
    ()
  }

  /** Bound the signature table's file count — the maintenance call a
    * per-micro-batch append cadence needs ([[TableStore.compactPlain]] on
    * the sigs table; the one-row params table never accumulates). The
    * no-op case is a directory listing, so callers run it after every
    * append. Returns the compacted version, if one was committed. */
  def compact(
      spark: SparkSession,
      store: TableStore,
      name: String,
      maxFiles: Int = 64,
      targetFiles: Int = 8): Option[Int] =
    store.compactPlain(spark, sigsTable(name), maxFiles, targetFiles)

  /** Takedown: commit a next version of the signatures table WITHOUT the
    * given ids (params untouched). After removal, a future arrival
    * resembling only the removed docs is admitted again — the screen's
    * memory genuinely forgets. Returns how many signatures were removed. */
  def remove(
      spark: SparkSession,
      ids: DataFrame,
      store: TableStore,
      name: String): Long = {
    val drop = broadcast(ids.select(col(ids.columns.head).as("_rm_id")).distinct())
    val (stored, readVersion) = store.snapshot(spark, sigsTable(name))
    // the takedown rewrite serves double duty: it starts from the SERVED
    // view, so pending supersede tombstones fold away in the same commit
    val served = servedOf(stored)
    val kept = served.join(drop, served("id") === col("_rm_id"), "left_anti")
    val before = served.count()
    store.write(kept, sigsTable(name), Some(readVersion))
    before - signatures(spark, store, name).count()
  }

  /** Band `(id, sig)` rows into `(id, sig, band, bucket)` — the same
    * bucketing [[Dedup.minhashLshPairs]] applies, derived here from STORED
    * signatures as a narrow projection (no text ever re-read). */
  private def banded(sigs: DataFrame, p: Params): DataFrame = {
    val rows = p.numHashes / p.bands
    sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(p.bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
        .as(Seq("band", "bucket")))
  }

  /** Admission screen: batch rows whose estimated Jaccard against ANY
    * stored doc reaches `threshold` are dropped; survivors pass through
    * with their original columns. Exact duplicates of stored docs carry
    * identical signatures (est = 1.0) and are dropped by the same test;
    * docs too short to shingle match nothing and are kept. Same hot-bucket
    * cap discipline as every LSH join here — a boilerplate bucket bounds
    * candidates at the cost of recall on that bucket, the standard trade.
    *
    * Scale shape: stored side is a narrow banding projection of `(id,
    * sig)`; candidates are a (band, bucket) equi-join; agreement is the
    * codegen'd signature compare; the drop list is ≤ batch ids, broadcast
    * into a left-anti. The corpus text is never touched. */
  def screen(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      name: String,
      threshold: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val p = params(spark, store, name)
    // both banded tables feed the hot-bucket agg plus the join — pin
    val sb = caches.pin(banded(signaturesOf(batch, idCol, textCol, p), p))
    val sc = caches.pin(banded(signatures(spark, store, name), p))
    def hotSide(s: DataFrame) = s.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("band", "bucket")
    val hot = hotSide(sb).union(hotSide(sc)).distinct()
    val coldB = sb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val coldC = sc.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val dropIds = coldB.alias("a")
      .join(coldC.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") =!= col("b.id")) // re-screening admitted docs is a no-op
      .select(col("a.id").as("_drop_id"),
        (org.apache.spark.sql.graft.NativeFunctions
          .long_positions_equal(col("a.sig"), col("b.sig")).cast("double") / p.numHashes)
          .as("_ej"))
      .filter(col("_ej") >= threshold)
      .select(col("_drop_id")).distinct()
    batch.join(broadcast(dropIds), batch(idCol) === col("_drop_id"), "left_anti")
  }

  // -------------------------------------------------------------- containment

  /** BOTH directed containment estimates per (arriving, stored) doc pair
    * — the TEXT analogue of [[Dedup.videoContainmentDirected]], from
    * SKETCHES instead of frames: the paywall stub / quoted article /
    * chapter-inside-the-book case [[screen]]'s symmetric Jaccard
    * structurally misses (the union is the big doc). From the signature
    * agreement Ĵ (matching minhash positions / k) and the stored
    * per-doc distinct-shingle counts, Broder's identities give
    * `|A∩B| ≈ Ĵ/(1+Ĵ)·(|A|+|B|)` and the two directed containments
    * |A∩B|/|A|, |A∩B|/|B| — an exact substring scores ≈1.0 on its own
    * side. Estimates, not exact counts: deterministic (the md5 family),
    * but a fixed threshold reads through ±O(1/√k) agreement noise —
    * size `numHashes` accordingly (128+ for containment work).
    *
    * Candidates: batch and stored share ANY single minhash position-
    * value — P(share) = 1−(1−J)ᵏ, ≈1 even at the low Jaccard a
    * contained snippet has against its container (per-BAND sharing, the
    * [[screen]] scheme, needs r consecutive agreements and misses
    * low-J/high-containment pairs by construction). Hot (position,
    * value) buckets capped on both sides; the corpus side is the narrow
    * position projection of stored state — text never re-read.
    *
    * @return (batch_id, stored_id, est_jaccard, containment_batch,
    *         containment_stored), greatest(containments) ≥
    *         minContainment */
  def screenContainment(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      name: String,
      minContainment: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val p = params(spark, store, name)
    containmentAgainst(
      caches.pin(signaturesOf(batch, idCol, textCol, p)),
      caches.pin(signatures(spark, store, name)),
      p, minContainment, maxBucketSize)
  }

  private def containmentAgainst(
      batchSigs: DataFrame, storedSigs: DataFrame, p: Params,
      minContainment: Double, maxBucketSize: Int)(
      implicit caches: CacheScope): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    require(storedSigs.columns.contains("n_sh"),
      "stored signatures carry no n_sh column (pre-containment index) — " +
        "rebuild the index to enable the containment screen")
    def positions(s: DataFrame) = caches.pin(
      s.select(col("id"), posexplode(col("sig")).as(Seq("i", "v"))))
    val pb = positions(batchSigs)
    val ps = positions(storedSigs)
    def hotSide(s: DataFrame) = s.groupBy(col("i"), col("v"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("i", "v")
    val hot = hotSide(pb).union(hotSide(ps)).distinct()
    val coldB = pb.join(broadcast(hot), Seq("i", "v"), "left_anti")
    val coldS = ps.join(broadcast(hot), Seq("i", "v"), "left_anti")
    val cand = coldB.alias("a")
      .join(coldS.alias("b"), col("a.i") === col("b.i") && col("a.v") === col("b.v"))
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("batch_id"), col("b.id").as("stored_id"))
      .distinct()
    cand
      .join(batchSigs.select(col("id").as("batch_id"), col("sig").as("_bs"),
        col("n_sh").cast("double").as("_na")), Seq("batch_id"))
      .join(storedSigs.select(col("id").as("stored_id"), col("sig").as("_ss"),
        col("n_sh").cast("double").as("_nb")), Seq("stored_id"))
      .withColumn("est_jaccard",
        org.apache.spark.sql.graft.NativeFunctions
          .long_positions_equal(col("_bs"), col("_ss")).cast("double") / p.numHashes)
      .withColumn("_inter",
        col("est_jaccard") / (lit(1.0) + col("est_jaccard"))
          * (col("_na") + col("_nb")))
      .select(col("batch_id"), col("stored_id"), col("est_jaccard"),
        (col("_inter") / col("_na")).as("containment_batch"),
        (col("_inter") / col("_nb")).as("containment_stored"))
      .filter(greatest(col("containment_batch"), col("containment_stored"))
        >= minContainment)
  }

  /** SUPERSEDE admission — the text keeper, [[FrameIndex
    * .admitSupersedeBatch]]'s fold on sketch containment: an arrival
    * CONTAINED in a stored doc (its own-side estimate ≥ the threshold —
    * the stub, the quoted excerpt, the re-crawl) rejects, and mutual
    * containment rejects FIRST so a near-exact copy never displaces its
    * source; an ADMITTED arrival that contains ≥ threshold of a STORED
    * doc's shingles SUBSUMES it — the full article retires the stored
    * snippet in the SAME CAS commit as the admissions (remove + append
    * is two commit points and a reader-visible window). Partial
    * overlaps admit without retiring. Idempotent by id like [[append]]
    * (a replayed batch's admitted ids are already indexed and no-op),
    * so the at-least-once foreachBatch contract composes to exactly-
    * once state — [[graft.streaming.AdmissionStream]]'s argument.
    *
    * Cost shape: EVERY drain commits O(batch ∪ tombstones) — admissions
    * link-append, retirements land as marker rows (`n_sh = −1`) in the
    * same single appendRows version, and every read subtracts the
    * marker ids ([[signatures]]); past `max(1024, live/8)` marker rows
    * the drain rides one amortized fold that rewrites the served view
    * and clears the markers. The corpus-sized tier is never rewritten
    * to admit a micro-batch.
    *
    * @return the admitted batch rows, original columns (the [[screen]]
    *         convention) */
  def supersede(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: TableStore,
      name: String,
      minContainment: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val p = params(spark, store, name)
    val (stored, readVersion) = store.snapshot(spark, sigsTable(name))
    val raw = caches.pin(stored)
    require(raw.columns.contains("n_sh"),
      "stored signatures carry no n_sh column (pre-containment index) — " +
        "rebuild the index to enable the supersede fold")
    val served = caches.pin(servedOf(raw))
    // insert-only against the RAW id set (⊇ tombstoned ids until the
    // fold — a retired id can never re-enter under its own name and be
    // hidden by the marker subtraction); in-batch duplicate ids fold to
    // the signature with the smallest array hash (deterministic under
    // any partitioning — the PostingsIndex.tokenized canonicalization)
    val batchSigs = caches.pin(
      signaturesOf(batch, idCol, textCol, p)
        .join(raw.select(col("id")), Seq("id"), "left_anti")
        .groupBy(col("id"))
        .agg(min_by(struct(col("sig"), col("n_sh")),
          xxhash64(col("sig"))).as("_w"))
        .select(col("id"), col("_w.sig").as("sig"), col("_w.n_sh").as("n_sh")))
    val pairs = caches.pin(containmentAgainst(batchSigs, served, p,
      minContainment, maxBucketSize))
    val rejected = pairs
      .filter(col("containment_batch") >= minContainment)
      .select(col("batch_id").as("id")).distinct()
    val admitted = caches.pin(
      batchSigs.join(broadcast(rejected), Seq("id"), "left_anti"))
    // stored docs subsumed by an ADMITTED arrival retire in the swap
    val retired = caches.pin(pairs
      .filter(col("containment_stored") >= minContainment)
      .join(admitted.select(col("id").as("batch_id")), Seq("batch_id"),
        "left_semi")
      .select(col("stored_id").as("id")).distinct())
    // commit: O(batch ∪ tombstones) by default — admissions plus the
    // retirements' marker rows land in ONE linked appendRows version
    // (single-table atomicity); past the policy bound the batch rides an
    // amortized fold that rewrites the served view and clears every
    // marker (the IvfIndex.OvlFrac rationale on marker ROWS)
    val markerCount = raw.filter(col("n_sh") < 0).count()
    val retiredCount = retired.count()
    val liveCount = served.count()
    val markers = retired.select(col("id"),
      array().cast("array<long>").as("sig"), lit(-1L).as("n_sh"))
    if (markerCount + retiredCount > math.max(1024L, liveCount / 8))
      store.write(
        served.join(broadcast(retired), Seq("id"), "left_anti")
          .unionByName(admitted),
        sigsTable(name), Some(readVersion))
    else
      store.appendRows(admitted.unionByName(markers),
        sigsTable(name), readVersion)
    val keptIds = admitted.select(col("id").as("_adm_id"))
    batch.join(broadcast(keptIds), batch(idCol) === col("_adm_id"), "left_semi")
  }
}
