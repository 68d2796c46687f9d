package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities: per-group centroids and norm profiles.
  *
  * Dataset cartography over an embedded corpus — "where does each source /
  * label / cluster sit, and how spread out is it" — reduces to two
  * aggregations over an `array<float>` column. Both are formulated long:
  * vectors POSEXPLODE into narrow `(group, pos, value)` rows and
  * hash-aggregate with map-side partial combine, so no executor ever holds
  * more than its partition's share and the shuffle carries one row per
  * (group, dimension, partition) — never whole vectors. Component order is
  * the array order on every engine, so results replay exactly in SQL.
  *
  * Reference scope: the reference's per-table summary profiling
  * (control_migration_schema_script.sql:516–540) extended to the embedding
  * surface per SURVEY §2.
  */
object Embeddings {

  /** Per-group mean vector in long form: `(groupCol, pos, centroid, n_vectors)`
    * with `pos` 0-based. Components average as doubles (float inputs widen
    * first — summing floats loses ~3 decimal digits per 10⁶ rows). */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("_v").cast("double")).as("centroid"),
        count(lit(1)).as("n_vectors"))

  /** The L2 norm of a vector column, as a double — the native codegen'd
    * dot product ([[graft.functions.VectorFunctions]]), bit-identical to
    * the ordered higher-order fold and to a SQL engine's loop. */
  def l2Norm(vec: Column): Column =
    graft.functions.VectorFunctions.l2Norm(
      graft.functions.VectorFunctions.toDouble(vec))

  /** Per-group norm profile: `(groupCol, n_vectors, avg_norm, min_norm,
    * max_norm)` — the quick health check for an embedding table (a
    * near-zero min flags empty inputs; wild max/avg spread flags an
    * unnormalized mix). */
  def normStats(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), l2Norm(col(vecCol)).as("_n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vectors"), avg(col("_n")).as("avg_norm"),
        min(col("_n")).as("min_norm"), max(col("_n")).as("max_norm"))

  /** Nearest-centroid (Rocchio) classification — the deterministic,
    * SQL-replayable form of the classifier-based domain/quality filter
    * (the role a fastText scorer plays in production corpus pipelines):
    * fit is one pass of per-class mean vectors over the labelled train
    * split ([[groupCentroids]]); predict assigns each test vector to the
    * class centroid with the highest cosine (ties → lowest class).
    *
    * Scale: the model is nClasses × dim doubles — broadcast, like every
    * centroid table here; scoring is one narrow pass over the test set
    * with a per-id rank bounded by nClasses (WindowGroupLimit keeps it
    * partial). Zero-norm test vectors are dropped (no direction to
    * classify); zero-norm class centroids are dropped like every other
    * centroid consumer. Output: `(idCol, predicted, score)`. */
  def centroidClassifier(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions
    val cents = groupCentroids(train, labelCol, vecCol)
      .withColumnRenamed(labelCol, "_class")
      .groupBy(col("_class"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("centroid")))),
        s => s.getField("centroid")).as("c_v"))
      .withColumn("c_nrm", VectorFunctions.l2Norm(col("c_v")))
      .filter(col("c_nrm") > 0)
    val base = test
      .select(col(idCol).as("_id"), VectorFunctions.toDouble(col(vecCol)).as("_v"))
      .withColumn("_nrm", VectorFunctions.l2Norm(col("_v")))
      .filter(col("_nrm") > 0)
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("score").desc, col("_class").asc)
    base.crossJoin(broadcast(cents))
      .withColumn("score",
        VectorFunctions.dot(col("_v"), col("c_v")) / (col("_nrm") * col("c_nrm")))
      .withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") === 1)
      .select(col("_id").as(idCol), col("_class").as("predicted"), col("score"))
  }
}
