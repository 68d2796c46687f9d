package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Persisted IVF index over an embedding corpus — the embedding-side
  * analogue of the reference's incremental state maintenance (watermarks,
  * control_migration_schema_script.sql:244, 412–416) and of
  * [[Dedup.dedupAgainst]]'s batch-vs-corpus discipline: fit once, persist,
  * then serve arriving batches against the stored state WITHOUT refitting.
  *
  * Storage (two versioned [[TableStore]] tables, atomic-swap like any
  * warehouse table):
  *
  *  - `<name>_centroids` — [[KMeans.fit]] output in long form
  *    `(cell, pos, centroid, n_assigned)`: kilobytes, the model;
  *  - `<name>_vectors` — the indexed corpus `(id, v, cell)`: each vector
  *    stored with its nearest-cell assignment, so a probe reads only the
  *    probed cells' rows.
  *
  * Scale shape (unchanged from [[Similarity.ivfTopKWithCentroids]]):
  * centroids BROADCAST everywhere they appear; assignment is one narrow
  * pass over the batch (argmax as a partial-combining max_by aggregate —
  * the exchange ships one row per vector, never batch × nCells);
  * [[append]] unions narrow `(id, v, cell)` rows into the next table
  * version; [[topK]]'s candidate join is an equi-join on `cell`, and each
  * (query, stored-vector) candidate arises at most once because a stored
  * vector lives in exactly ONE cell — no dedup exchange at all, strictly
  * cheaper than the self-join IVF path.
  */
object IvfIndex {

  private def centroidsTable(name: String) = s"${name}_centroids"
  private def vectorsTable(name: String) = s"${name}_vectors"
  private def qVectorsTable(name: String) = s"${name}_qvectors"

  /** Fit spherical k-means on `df` and persist BOTH halves of the index.
    * Returns the fitted centroids (long form, as stored). */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      iterations: Int,
      store: TableStore,
      name: String)(implicit caches: CacheScope): DataFrame = {
    val fitted = KMeans.fit(df, idCol, vecCol, nCells, iterations)
    store.write(fitted, centroidsTable(name))
    store.write(assign(df, idCol, vecCol, centroidVectorsOf(fitted)), vectorsTable(name))
    fitted
  }

  /** The stored model re-assembled as `(cell, c_v)` vectors. */
  def centroids(spark: SparkSession, store: TableStore, name: String): DataFrame =
    centroidVectorsOf(store.read(spark, centroidsTable(name)))

  /** The indexed corpus `(id, v, cell)` as stored. */
  def vectors(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, vectorsTable(name))

  private def centroidVectorsOf(fittedLongForm: DataFrame): DataFrame =
    KMeans.centroidVectors(fittedLongForm)

  /** Refit-free nearest-cell assignment: each batch row → `(id, v, cell)`
    * under the SAME rule as the trainer (cosine desc, cell asc; zero-norm
    * cells dropped). One narrow pass — centroids broadcast, argmax via
    * map-side-combining max_by. Zero-norm batch vectors are dropped (they
    * have no direction; same guard as [[KMeans.fit]]). */
  def assign(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      centroidVectors: DataFrame): DataFrame = {
    val base = batch
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .filter(col("nrm") > 0)
    val cents = centroidVectors
      .select(col("cell"), col("c_v"))
      .withColumn("c_nrm", l2Norm(col("c_v")))
      .filter(col("c_nrm") > 0)
    base.crossJoin(broadcast(cents))
      .withColumn("sim", dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cell"), col("v")),
        struct(col("sim"), -col("cell"))).as("_best"))
      .select(col("id"), col("_best.v").as("v"), col("_best.cell").as("cell"))
  }

  /** Incremental maintenance: assign an arriving batch to the PERSISTED
    * centroids (no refit) and commit corpus ∪ batch as the next version of
    * the vectors table — the daily operation of a production embedding
    * pipeline. The model version is untouched.
    *
    * The tiers commit as SEPARATE per-table CAS swaps (float, then int8,
    * then PQ codes), so a crash mid-append leaves later tiers behind the
    * float tier. The repair contract is RETRY: every tier's union
    * anti-joins the batch against its OWN stored ids, so re-running the
    * same append is idempotent per tier — already-appended tiers pass
    * through untouched (no duplicate rows) and the missing tiers catch
    * up, converging all tiers to the consistent state. Until the retry,
    * a lagging sibling tier serves as if the batch had not arrived yet
    * (its probes miss the new ids; re-ranks drop ids its shortlist never
    * proposes) — stale, never corrupt. */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String): Unit = {
    val assigned = assign(batch, idCol, vecCol, centroids(spark, store, name))
    // snapshot: the write CASes against the version this union derived from
    val (stored, readVersion) = store.snapshot(spark, vectorsTable(name))
    val fresh = assigned.join(stored.select(col("id")), Seq("id"), "left_anti")
    store.write(stored.unionByName(fresh), vectorsTable(name), Some(readVersion))
    // a quantized sibling is SERVING state — it must see the same append,
    // or quantized probes silently miss everything admitted since the
    // last quantizeStored
    if (store.exists(qVectorsTable(name))) {
      val (scale, qv) = quantizeCols(col("v"))
      val (qStored, qVersion) = store.snapshot(spark, qVectorsTable(name))
      store.write(
        qStored.unionByName(
          assigned.join(qStored.select(col("id")), Seq("id"), "left_anti")
            .select(col("id"), col("cell"), scale.as("scale"), qv.as("qv"))),
        qVectorsTable(name), Some(qVersion))
    }
    // the PQ tier is serving state too — encode the batch against the
    // COMMITTED codebook (refit-free, like the int8 re-quantization)
    if (PqIndex.exists(store, name))
      PqIndex.appendEncoded(spark, assigned, store, name)
  }

  /** Takedown: commit a next version of the vectors table WITHOUT the
    * given ids — the removal path an index must have at scale (a handful
    * of right-to-be-forgotten ids cannot cost a corpus re-fit; the model
    * is untouched and probe behaviour for every other vector is
    * unchanged). `ids` is broadcast into an anti-join — callers pass the
    * takedown list, which is small by nature. Returns how many vectors
    * were actually removed. */
  def remove(
      spark: SparkSession,
      ids: DataFrame,
      store: TableStore,
      name: String): Long = {
    val drop = broadcast(ids.select(col(ids.columns.head).as("_rm_id")).distinct())
    val (stored, readVersion) = store.snapshot(spark, vectorsTable(name))
    val kept = stored.join(drop, stored("id") === col("_rm_id"), "left_anti")
    val before = stored.count()
    store.write(kept, vectorsTable(name), Some(readVersion))
    // takedown must reach the quantized sibling too — a removed vector
    // that still matches quantized probes isn't removed at all
    if (store.exists(qVectorsTable(name))) {
      val (qStored, qVersion) = store.snapshot(spark, qVectorsTable(name))
      store.write(qStored.join(drop, qStored("id") === col("_rm_id"), "left_anti"),
        qVectorsTable(name), Some(qVersion))
    }
    if (PqIndex.exists(store, name))
      PqIndex.removeIds(spark, drop, store, name)
    before - vectors(spark, store, name).count()
  }

  /** Per-cell occupancy of the stored corpus — the index's health metric,
    * one partial-combined aggregate over the narrow `(id, v, cell)` table
    * (the `v` column is pruned at the scan). Cells the model declares but
    * no vector occupies are absent here; [[balance]] accounts for them. */
  def cellStats(spark: SparkSession, store: TableStore, name: String): DataFrame =
    vectors(spark, store, name).groupBy(col("cell")).agg(count(lit(1)).as("n"))

  /** Occupancy balance summary. `skewRatio` = max/mean occupancy where the
    * mean is taken over the MODEL's cells, not just the live ones — a cell
    * drained to zero is precisely the drift evidence the ratio must see.
    * A freshly trained index sits near 1; probe recall decays as the ratio
    * grows (hot cells make nProbe cells cover less of the corpus). */
  final case class CellBalance(
      nCellsModel: Int, nCellsLive: Int, maxOccupancy: Long, meanOccupancy: Double) {
    def skewRatio: Double =
      if (meanOccupancy == 0.0) 0.0 else maxOccupancy / meanOccupancy
  }

  /** Compute [[CellBalance]] — two tiny aggregates (≤ nCells rows ever
    * reach the driver). Cheap enough to run after every [[append]]. */
  def balance(spark: SparkSession, store: TableStore, name: String): CellBalance = {
    val nModel = store.read(spark, centroidsTable(name))
      .select(col("cell")).distinct().count().toInt
    val occ = cellStats(spark, store, name).collect().map(_.getLong(1))
    CellBalance(
      nCellsModel = nModel,
      nCellsLive = occ.length,
      maxOccupancy = if (occ.isEmpty) 0L else occ.max,
      meanOccupancy = if (nModel == 0) 0.0 else occ.sum.toDouble / nModel)
  }

  /** Incremental SEMANTIC screening against the persisted index — the
    * embedding-side [[Dedup.dedupAgainst]]: drop every batch row whose
    * best stored neighbour (within the probed cells) reaches `threshold`
    * cosine, keep the rest. The daily SemDeDup admission check for
    * arriving data: the corpus is NEVER re-paired — screening is one
    * cell-bounded equi-join of the batch against stored state
    * ([[topK]] with k=1), and the drop list that comes back is ≤ batch
    * rows, broadcast into a narrow anti-join. Zero-norm batch rows have
    * no direction, match nothing, and are kept. Batch columns pass
    * through untouched. */
  def dedupAgainstIndex(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String,
      threshold: Double,
      nProbe: Int): DataFrame = {
    val dups = topK(spark, batch, idCol, vecCol, store, name, k = 1, nProbe)
      .filter(col("cosine") >= threshold)
      .select(col("vec_id").as("_dup_id"))
    batch.join(broadcast(dups), batch(idCol) === col("_dup_id"), "left_anti")
  }

  /** The refit trigger [[append]]-forever needs: when occupancy skew
    * exceeds `bound`, refit the model ON THE STORED CORPUS via [[build]]
    * (same cell count) and commit both halves as next versions — readers
    * swap atomically, and a concurrent appender loses its CAS instead of
    * splicing stale cell ids into the rebuilt index. Below the bound this
    * is a metadata-cost no-op returning None.
    *
    * Policy, not mechanism: a production pipeline calls this after its
    * append cadence (e.g. daily) with a bound around 2–4; the refit costs
    * one k-means fit over the corpus — the same cost profile as the
    * original build, amortized over every probe that stops paying the
    * drift tax. */
  def rebalance(
      spark: SparkSession,
      store: TableStore,
      name: String,
      bound: Double,
      iterations: Int = 2)(implicit caches: CacheScope): Option[DataFrame] = {
    require(bound >= 1.0, s"bound is a max/mean ratio, must be >= 1, got $bound")
    val b = balance(spark, store, name)
    if (b.skewRatio <= bound) None
    else {
      val fitted = build(vectors(spark, store, name).select(col("id"), col("v")),
        "id", "v", b.nCellsModel, iterations, store, name)
      // sibling tiers carry the OLD cell ids after a refit — a quantized
      // or PQ probe against them would equi-join two unrelated cell
      // spaces; re-derive both from the refitted float table
      repairTiers(spark, store, name)
      Some(fitted)
    }
  }

  /** Re-derive every SIBLING tier from the committed float tier — the
    * convergent repair for a crash mid-[[rebalance]]: the refit commits
    * the model + float tier first, so dying before the sibling refreshes
    * leaves int8/PQ rows on the OLD cell space (their probes equi-join
    * two unrelated cell id spaces — wrong, not merely stale), and simply
    * re-running rebalance may short-circuit on the now-healthy skew
    * without ever touching them. This op is idempotent and cheap (one
    * narrow pass per sibling: int8 re-quantizes, PQ codes are
    * cell-independent and only re-join their cell column), so a
    * production pipeline runs it after any interrupted maintenance
    * window — or unconditionally; it converges from any tier state. */
  def repairTiers(spark: SparkSession, store: TableStore, name: String): Unit = {
    if (store.exists(qVectorsTable(name))) quantizeStored(spark, store, name)
    if (PqIndex.exists(store, name))
      PqIndex.refreshCells(spark,
        vectors(spark, store, name).select(col("id"), col("cell")), store, name)
  }

  // -------------------------------------------------------------------
  // int8 scalar quantization — the storage diet for the 100 TB index.
  // Per-vector symmetric scheme (public knowledge; cf. faiss SQ8):
  // scale = max|component| / 127, component → floor(x/scale + 0.5)
  // clamped to [-127, 127]. floor(+0.5) instead of round() because the
  // two SQL dialects disagree on round-half of negatives while floor is
  // identical everywhere — the quantized value, and therefore the
  // dequantized score, replays bit-for-bit in the oracle.
  // -------------------------------------------------------------------

  /** `(scale, qv)` columns for a double-array vector column. The max
    * component maps to exactly ±127 (scale is derived from it), so the
    * clamp only ever guards float jitter — no clipping error; per-component
    * dequantization error is ≤ scale/2. */
  private def quantizeCols(v: Column): (Column, Column) = {
    val scale = array_max(transform(v, abs(_))) / lit(127.0)
    val qv = transform(v, x =>
      greatest(lit(-127L), least(lit(127L), floor(x / scale + lit(0.5)))).cast("byte"))
    (scale, qv)
  }

  /** Quantize an existing index's stored vectors into the int8 sibling
    * table `<name>_qvectors` `(id, cell, scale double, qv array<byte>)` —
    * ~1 byte per component versus 8 for the float table, which is what
    * dominates index storage at corpus scale. One narrow pass over the
    * stored table; the model is untouched, and probes that can tolerate
    * the ≤ scale/2 per-component error serve entirely from the quantized
    * rows ([[topKQuantized]]). */
  def quantizeStored(spark: SparkSession, store: TableStore, name: String): Unit = {
    val stored = vectors(spark, store, name)
    val (scale, qv) = quantizeCols(col("v"))
    store.write(
      stored.select(col("id"), col("cell"), scale.as("scale"), qv.as("qv")),
      qVectorsTable(name))
  }

  /** The quantized corpus as stored: `(id, cell, scale, qv)`. */
  def quantizedVectors(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, qVectorsTable(name))

  /** Dequantized view `(id, cell, v)` of [[quantizedVectors]] — the scoring
    * input. A nonzero vector's max component quantizes to ±127, so the
    * dequantized norm is never zero and the cosine stays defined. */
  private def dequantized(qvec: DataFrame): DataFrame =
    qvec.select(col("id"), col("cell"),
      transform(col("qv"), x => x.cast("double") * col("scale")).as("v"))

  /** Top-k stored neighbours for each batch vector, probing the `nProbe`
    * nearest stored cells. Self-matches are excluded by id equality —
    * callers indexing and querying overlapping id spaces from different
    * tables should disambiguate ids first.
    *
    * Plan: batch × broadcast(centroids) ranks probe cells (window over the
    * batch's own nCells candidate rows); candidates are an equi-join on
    * `cell` against the stored `(id, v, cell)` rows — dir-pruned to probed
    * cells' data by the join itself; scoring happens inside the join so
    * the aggregation exchange carries `(id, id, double)`, and the partial
    * top-k aggregate ships k rows per (query, partition). */
  def topK(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String,
      k: Int,
      nProbe: Int): DataFrame =
    topKAgainst(spark, batch, idCol, vecCol, store, name, k, nProbe,
      vectors(spark, store, name))

  /** [[topK]] served from the int8 table — same probe ranking (the model
    * is full-precision either way), same candidate-join shape; only the
    * scored corpus rows are dequantized `qv × scale` products. The scan
    * reads ~1/8 the bytes of the float path. */
  def topKQuantized(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String,
      k: Int,
      nProbe: Int): DataFrame =
    topKAgainst(spark, batch, idCol, vecCol, store, name, k, nProbe,
      dequantized(quantizedVectors(spark, store, name)))

  /** Two-stage QUALITY serving from the persisted index (the
    * [[Pq.topKRefined]] shortlist-and-refine trick applied to stored
    * state): the int8 table ranks a `shortlist` per query at a wider
    * probe, and exact cosine on the float table re-ranks ONLY the
    * shortlist. Recall is then the float path's at the same `nProbe` —
    * quantization error is confined to shortlist membership (with
    * `shortlist >> k` it almost never evicts a true top-k neighbour) —
    * while the probe scan still reads the ~1/8-byte quantized rows:
    * serving at nProbe=4 over int8 costs about the same scan bytes as the
    * base tier's nProbe=2 over floats, and the refine joins move only
    * `shortlist` narrow rows per query (equi-join on id, never
    * all-pairs). Output schema matches [[topK]]. */
  def topKRefined(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String,
      k: Int,
      nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k && k >= 1, s"need shortlist $shortlist >= k $k >= 1")
    val short = topKAgainst(spark, batch, idCol, vecCol, store, name,
        shortlist, nProbe, dequantized(quantizedVectors(spark, store, name)))
      .select(col("vec_id"), col("neighbor_id"))
    val q = batch
      .select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", l2Norm(col("q_v")))
    val corpus = vectors(spark, store, name)
      .select(col("id").as("neighbor_id"), col("v").as("n_v"))
      .withColumn("n_nrm", l2Norm(col("n_v")))
    Similarity.exactRerank(short, q, corpus, k)
  }

  /** Queries in probe shape: `(q_id, q_v, q_nrm)` with zero-norm
    * (directionless) rows dropped. */
  private[operators] def probeQueries(
      batch: DataFrame, idCol: String, vecCol: String): DataFrame =
    batch
      .select(col(idCol).as("q_id"), toDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", l2Norm(col("q_v")))
      .filter(col("q_nrm") > 0)

  /** The stored model in probe shape: `(cell, c_v, c_nrm)`, zero-norm
    * cells dropped. */
  private[operators] def probeCentroids(
      spark: SparkSession, store: TableStore, name: String): DataFrame =
    centroids(spark, store, name)
      .select(col("cell"), col("c_v"))
      .withColumn("c_nrm", l2Norm(col("c_v")))
      .filter(col("c_nrm") > 0)

  /** Rank each query's `nProbe` nearest cells against the BROADCAST
    * centroids — the probe stage every persisted-index searcher shares
    * (one definition, so the (cosine desc, cell asc) tie-break can never
    * diverge between tiers). `q` carries `q_id`/`q_v`/`q_nrm` plus any
    * extra columns, which pass through; returns `q`'s columns + `cell`. */
  private[operators] def probeCells(
      q: DataFrame, cents: DataFrame, nProbe: Int): DataFrame = {
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("cell").asc)
    q.crossJoin(broadcast(cents))
      .withColumn("c_sim", dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select(q.columns.map(col).toIndexedSeq :+ col("cell"): _*)
  }

  private def topKAgainst(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String,
      k: Int,
      nProbe: Int,
      corpusVectors: DataFrame): DataFrame = {
    val q = probeQueries(batch, idCol, vecCol)
    val probes = probeCells(q, probeCentroids(spark, store, name), nProbe)
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("cell"))
    val corpus = corpusVectors
      .withColumn("nrm", l2Norm(col("v")))
    // a stored vector lives in exactly one cell → each (q_id, id) pair
    // scores at most once; no dropDuplicates exchange needed
    val scored = probes.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id"),
        (dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm"))).as("cosine"))
    Similarity.topKFromScored(scored, k)
  }
}
