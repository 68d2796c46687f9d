package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * pipeline. The model version is untouched. */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      store: TableStore,
      name: String): Unit = {
    val assigned = assign(batch, idCol, vecCol, centroids(spark, store, name))
    store.write(vectors(spark, store, name).unionByName(assigned), vectorsTable(name))
  }

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
      nProbe: Int): DataFrame = {
    val q = batch
      .select(col(idCol).as("q_id"), toDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", l2Norm(col("q_v")))
      .filter(col("q_nrm") > 0) // directionless queries have no cosine order
    val cents = centroids(spark, store, name)
      .select(col("cell"), col("c_v"))
      .withColumn("c_nrm", l2Norm(col("c_v")))
      .filter(col("c_nrm") > 0)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("c_sim", dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("cell"))
    val corpus = vectors(spark, store, name)
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
