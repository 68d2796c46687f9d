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
}
