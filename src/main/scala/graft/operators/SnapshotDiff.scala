package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus snapshot diff: what changed between two versions of a corpus.
  *
  * Recurring crawls / CDC-fed corpora need "what did this refresh actually
  * do" before anything downstream re-runs: how many documents appeared,
  * vanished, or changed content — and therefore how much re-embedding,
  * re-deduplication and re-packing is due. The diff is one full-outer join
  * on the id plus a normalized-fingerprint comparison ([[TextFunctions
  * .fingerprint]]: whitespace/case-insensitive, so cosmetic rewrites don't
  * count as modifications).
  *
  * Scale: both sides project to `(id, fingerprint)` before the join — two
  * narrow md5 columns shuffle once on id, never the text. This is the same
  * discipline as the reference's watermark probe (what's new since last
  * sync, control_migration_schema_script.sql:346–366) applied
  * content-aware to whole corpora.
  */
object SnapshotDiff {

  /** `(idCol, status)` for every id present in either snapshot:
    * `added` (new only), `removed` (old only), `modified` (both, different
    * normalized fingerprint), `unchanged`. */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("_id"),
      TextFunctions.fingerprint(col(textCol)).as("_old_fp"))
    val n = newSnap.select(col(idCol).as("_id"),
      TextFunctions.fingerprint(col(textCol)).as("_new_fp"))
    o.join(n, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_old_fp").isNull, lit("added"))
          .when(col("_new_fp").isNull, lit("removed"))
          .when(col("_old_fp") =!= col("_new_fp"), lit("modified"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Roll-up: `(status, n_docs)` — the refresh report. */
  def summary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
