package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product-quantized sibling of the persisted [[IvfIndex]] — the third
  * storage tier of the same index (float → int8 → PQ codes), and the
  * reference-analogous state-maintenance story
  * (control_migration_schema_script.sql:244, 412–416) at PQ compression:
  * the model trains ONCE on the stored corpus and every later probe,
  * append, and takedown serves from committed state. This is what the
  * ad-hoc [[Pq]] entry points cannot do — they retrain codebooks inside
  * every invocation, a cost a 100 TB corpus pays exactly once, here.
  *
  * Storage (two more versioned [[TableStore]] tables under the SAME index
  * name, sharing `<name>_centroids` / `<name>_vectors` with the float and
  * int8 tiers):
  *
  *  - `<name>_pq_codebook` — the trained model `(sub, code, c_v)`:
  *    m × nCodes × subDim doubles, kilobytes, read once per query and
  *    shipped as the [[org.apache.spark.sql.graft.PqAdcScore]] constant;
  *  - `<name>_pq_codes` — the encoded corpus `(id, cell, n_codes)`: `m`
  *    small integers per vector (16 bytes at the declared operating
  *    point vs 64 int8 bytes vs 512 float bytes — the scan-byte budget
  *    that makes a wide probe affordable).
  *
  * Scale shape: probes rank cells against the BROADCAST shared centroids
  * (one narrow window over batch × nCells candidate rows); candidates are
  * an equi-join on `cell` against the codes table — each stored vector
  * lives in exactly one cell, so no dedup exchange; ADC scoring is the
  * native codegen fold, one m-byte code row per pair; only the
  * `shortlist` survivors per query touch the float table, as narrow
  * id-equi-joins. [[IvfIndex.append]]/[[IvfIndex.remove]] keep this tier
  * in lockstep with its siblings — encoding an arriving batch against the
  * stored codebook is refit-free, the same discipline as the int8 tier's
  * re-quantization.
  */
object PqIndex {

  private def codebookTable(name: String) = s"${name}_pq_codebook"
  private def codesTable(name: String) = s"${name}_pq_codes"

  def exists(store: TableStore, name: String): Boolean =
    store.exists(codesTable(name))

  /** The stored codebook `(sub, code, c_v)` as committed. */
  def codebook(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, codebookTable(name))

  /** The encoded corpus `(id, cell, n_codes)` as committed. */
  def codes(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, codesTable(name))

  /** Train PQ codebooks on an existing index's STORED float corpus and
    * commit model + codes — after this, serving never retrains: probes
    * read `<name>_pq_codes`, and [[IvfIndex.append]] encodes arriving
    * batches against the committed codebook. Training is [[Pq]]'s grouped
    * Lloyd (md5-smallest seeds, `iterations` assignment/mean rounds) over
    * the stored vectors' unit forms — deterministic given the corpus, so
    * the committed state replays in SQL exactly like its siblings. */
  def buildStored(
      spark: SparkSession,
      store: TableStore,
      name: String,
      m: Int,
      nCodes: Int,
      iterations: Int)(implicit caches: CacheScope): Unit = {
    val stored = IvfIndex.vectors(spark, store, name)
    val dim = stored.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val unit = unitized(stored)
    val (subs, cb) = Pq.trainCodebooks(unit.select(col("id"), col("u")),
      m, subDim, nCodes, iterations)
    val cbDf = Pq.codebookFrame(spark, cb)
    store.write(cbDf.select(col("sub"), col("code"), col("c_v")), codebookTable(name))
    val arr = Pq.codesToArray(Pq.assignCodes(subs, broadcast(cbDf)))
    store.write(arr.join(unit.select(col("id"), col("cell")), Seq("id"))
      .select(col("id"), col("cell"), col("n_codes")), codesTable(name))
  }

  /** `(id, cell, u)` unit forms of a stored-shape `(id, v, cell)` frame.
    * Zero-norm vectors have no direction and are dropped — the same guard
    * as every trainer in the family. */
  private def unitized(stored: DataFrame): DataFrame =
    stored.withColumn("nrm", l2Norm(col("v")))
      .filter(col("nrm") > 0)
      .withColumn("u", transform(col("v"), x => x / col("nrm")))

  /** Driver-side copy of the stored codebook plus the flat-array layout
    * parameters the native scorer needs. `stride` is the smallest power
    * layout that indexes every committed code — derived from the stored
    * rows, so serving needs no out-of-band model config. */
  private def loadCodebook(
      spark: SparkSession, store: TableStore, name: String)
      : (Seq[(Int, Int, Seq[Double])], Int, Int, Int) = {
    val rows = codebook(spark, store, name).collect()
    require(rows.nonEmpty, s"empty PQ codebook for index '$name'")
    val cb = rows.map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2): Seq[Double])).toSeq
    val m = cb.map(_._1).max + 1
    val stride = cb.map(_._2).max + 1
    val subDim = cb.head._3.length
    (cb, m, stride, subDim)
  }

  /** Refit-free incremental maintenance: encode an already-cell-assigned
    * batch `(id, v, cell)` against the COMMITTED codebook and CAS the
    * union in as the next codes-table version. Called by
    * [[IvfIndex.append]] whenever the PQ tier exists — an appended vector
    * that quantized probes cannot see isn't indexed at all (the same
    * serving-state argument as the int8 sibling). */
  private[operators] def appendEncoded(
      spark: SparkSession,
      assigned: DataFrame,
      store: TableStore,
      name: String): Unit = {
    val (cb, m, _, subDim) = loadCodebook(spark, store, name)
    val unit = unitized(assigned)
    val subs = Pq.subvectors(unit.select(col("id"), col("u")), m, subDim)
    val arr = Pq.codesToArray(
      Pq.assignCodes(subs, broadcast(Pq.codebookFrame(spark, cb))))
    val batchCodes = arr.join(unit.select(col("id"), col("cell")), Seq("id"))
      .select(col("id"), col("cell"), col("n_codes"))
    val (stored, version) = store.snapshot(spark, codesTable(name))
    // per-tier id dedup: a RETRIED append (the repair for a crash between
    // the index's tier commits — see IvfIndex.append) must pass through
    // already-encoded ids instead of duplicating their code rows
    val freshCodes = batchCodes
      .join(stored.select(col("id")), Seq("id"), "left_anti")
    store.write(stored.unionByName(freshCodes), codesTable(name), Some(version))
  }

  /** Takedown for the PQ tier — called by [[IvfIndex.remove]]: a removed
    * vector whose code row still matches probes isn't removed at all. */
  private[operators] def removeIds(
      spark: SparkSession,
      drop: DataFrame,
      store: TableStore,
      name: String): Unit = {
    val (stored, version) = store.snapshot(spark, codesTable(name))
    store.write(stored.join(drop, stored("id") === col("_rm_id"), "left_anti"),
      codesTable(name), Some(version))
  }

  /** Post-refit cell refresh — called by [[IvfIndex.rebalance]]: codes
    * are cell-independent (the codebook quantizes directions, not
    * partitions), so a refit only re-joins the `cell` column from the
    * refitted float table. */
  private[operators] def refreshCells(
      spark: SparkSession,
      newCells: DataFrame,
      store: TableStore,
      name: String): Unit = {
    val (stored, version) = store.snapshot(spark, codesTable(name))
    store.write(stored.drop("cell").join(newCells, Seq("id"))
      .select(col("id"), col("cell"), col("n_codes")), codesTable(name), Some(version))
  }

  /** Two-stage QUALITY serving from the PQ tier (the [[Pq.topKRefined]]
    * shortlist-and-refine applied to COMMITTED state): stored codes rank a
    * `shortlist` per query by native ADC at `nProbe` cells, then exact
    * cosine on the stored float table re-ranks only the shortlist.
    * Recall is the float path's at the same probe width — quantization
    * error is confined to shortlist membership — while the candidate scan
    * reads m-byte code rows, the cheapest tier the index stores. Output
    * schema matches [[IvfIndex.topK]]: `(vec_id, neighbor_id, cosine,
    * rank)`, exact cosine. */
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
    val (cb, m, stride, subDim) = loadCodebook(spark, store, name)
    val flat = Pq.flatCodebook(cb, m, stride, subDim)

    val q = IvfIndex.probeQueries(batch, idCol, vecCol)
      .withColumn("q_u", transform(col("q_v"), x => x / col("q_nrm")))
    val probes = IvfIndex.probeCells(
        q, IvfIndex.probeCentroids(spark, store, name), nProbe)
      .select(col("q_id"), col("q_u"), col("cell"))

    // candidates: one row per (query, stored code row) in the probed
    // cells — a stored vector lives in exactly one cell, so each pair
    // arises once; scoring is the codegen ADC fold, no per-pair state
    val scored = probes.join(codes(spark, store, name), Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id"),
        org.apache.spark.sql.graft.PqAdcScore.pq_adc_score(
          col("q_u"), col("n_codes"), flat.toIndexedSeq, stride, subDim).as("score"))
    val short = scored
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("score"), col("neighbor_id"), shortlist).as("tk"))
      .select(col("vec_id"), explode(col("tk")).as("e"))
      .select(col("vec_id"), col("e.neighbor_id").as("neighbor_id"))

    // exact re-rank of the shortlist on the stored float tier
    val corpus = IvfIndex.vectors(spark, store, name)
      .select(col("id").as("neighbor_id"), col("v").as("n_v"))
      .withColumn("n_nrm", l2Norm(col("n_v")))
    Similarity.exactRerank(short,
      q.select(col("q_id").as("vec_id"), col("q_v"), col("q_nrm")), corpus, k)
  }
}
