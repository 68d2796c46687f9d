package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.DmsFileClassifier

/** `prepare_migration_queue` (control_migration_schema_script.sql:60–158) as
  * a pure, testable DataFrame pipeline: stage listings + metadata →
  * per-table load decisions.
  *
  * Stages (SURVEY Entry 1):
  *  - A2: group the listing by (stage, file-prefix) computing the newest
  *    incremental file name (MAX over non-full-load names; full-load rows
  *    contribute the `'0'` sentinel, sql:131) and the newest full-load
  *    mtime (sql:128–139);
  *  - J1: inner join to the metadata on prefix + stage (case-insensitive,
  *    sql:142) with the newer-than-watermark residual (sql:143–146) — only
  *    tables with genuinely new files survive (the reference's 'N' CASE
  *    branch is dead-row belt-and-braces, sql:121);
  *  - F8: CASE → load type: 'B' both, 'I' incremental only, 'F' full only.
  *
  * Both sides are control-plane tiny (one row per table / per file);
  * Catalyst auto-broadcasts the join. The queue-sharding `uniform(1,n,
  * seq1())` of sql:123 intentionally disappears — Spark's scheduler (or the
  * orchestrator's Futures) replaces hand-rolled worker sharding.
  */
object SyncPlanner {

  final case class WorkItem(fullPath: String, loadType: String)

  /** A2 — per-(stage, table-prefix) summary of the newest files.
    * `listing` needs columns (file, last_modified, stage). */
  def summarize(listing: DataFrame): DataFrame =
    listing
      .withColumn("file_prefix", DmsFileClassifier.filePrefix(col("file")))
      .groupBy(col("stage"), col("file_prefix"))
      .agg(
        // Only strict change files count as incremental candidates — the
        // same regex the merge applies (IncrementalMerge), so the planner
        // never emits work the merge will refuse; full-load files and any
        // stray non-DMS names contribute the '0' sentinel (sql:131).
        max(when(DmsFileClassifier.isChangeFile(col("file")),
          element_at(split(col("file"), "/"), -1)).otherwise(lit("0")))
          .as("newest_incremental_file"),
        max(when(DmsFileClassifier.isFullLoad(col("file")), col("last_modified")))
          .as("newest_full_load_date"))

  /** J1 + F8 — join the summary to the metadata and decide the load type.
    * `metaDf` needs (full_path, stage, last_incremental_file,
    * last_full_load_date). Output: (full_path, load_type). */
  def decide(summary: DataFrame, metaDf: DataFrame): DataFrame = {
    val s = summary.alias("s"); val m = metaDf.alias("m")
    val newerIncremental =
      col("s.newest_incremental_file") > col("m.last_incremental_file")
    val newerFull = col("s.newest_full_load_date").isNotNull &&
      (col("m.last_full_load_date").isNull ||
        col("s.newest_full_load_date") > col("m.last_full_load_date"))
    m.join(s,
        col("m.full_path") === col("s.file_prefix") &&
          upper(col("m.stage")) === upper(col("s.stage")) &&
          (newerIncremental || newerFull),
        "inner")
      .select(
        col("m.full_path").as("full_path"),
        when(newerFull && newerIncremental, lit("B"))
          .when(newerIncremental, lit("I"))
          .when(newerFull, lit("F"))
          .otherwise(lit("N"))
          .as("load_type"))
  }

  def plan(listing: DataFrame, metaDf: DataFrame): Seq[WorkItem] =
    decide(summarize(listing), metaDf)
      .collect()
      .map(r => WorkItem(r.getString(0), r.getString(1)))
      .toSeq
      .sortBy(_.fullPath)

  /** Metadata rows → the DataFrame shape `decide` consumes. */
  def metaDf(spark: SparkSession, metas: Seq[graft.meta.TableMeta]): DataFrame = {
    import spark.implicits._
    metas.map(m => (m.fullPath, m.stage, m.lastIncrementalFile,
        m.lastFullLoadDate.orNull: java.sql.Timestamp))
      .toDF("full_path", "stage", "last_incremental_file", "last_full_load_date")
  }
}
