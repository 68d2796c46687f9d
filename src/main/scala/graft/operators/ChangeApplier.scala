package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core CDC change-application semantics
  * (control_migration_schema_script.sql:369–411), as a pure DataFrame →
  * DataFrame transformation so it is unit-testable against a fold oracle.
  *
  * Steps (SURVEY W1 + J2):
  *  1. collapse the change log to the single LATEST row per primary key —
  *     `row_number() over (partition by pks order by _file_name desc,
  *     _row_in_file desc) = 1`. The reference uses `rank()`; with the
  *     (file, row#) total order they are equivalent, and `row_number`
  *     additionally guards the pathological duplicate-position tie
  *     (SURVEY §7.4-4, documented deviation).
  *  2. apply tombstones: a PK whose latest op is 'D' is dropped even if
  *     earlier ops inserted it (sql:401–407; 'D' deletes, a NULL op is a
  *     no-op exactly as in the reference's MERGE, and any other op is an
  *     upsert).
  *  3. join-based upsert onto the target: `target ANTI-JOIN changed-pks`
  *     UNION `surviving latest rows` — one shuffle on the PK, no
  *     full-outer reconstruction needed.
  *
  * NULL-PK caveat kept from the reference: `T.pk = S.pk` (sql:337, 400)
  * means NULL PKs never match — we use `===`, not `<=>`.
  *
  * Scale: the single wide shuffle is `partitionBy(pks)` for the window; the
  * anti-join reuses PK hashing. Target-side reads are column-pruned parquet.
  * Change batches are typically ≪ target size, so Catalyst/AQE picks a
  * broadcast for the anti-join's source side when it fits — exactly the
  * plan you want at 1000 executors.
  */
object ChangeApplier {

  /** Latest-row-per-PK dedup (W1). Input must carry `_file_name` and
    * `_row_in_file`; output keeps one row per PK, still carrying `op`.
    *
    * Implemented as `max_by(payload, (file, row))` — the reference's
    * `rank() over (order by file desc, row# desc) = 1` is exactly the
    * maximum under the lexicographic (file, row) order, and the aggregate
    * formulation is the scale-correct plan: partial aggregation collapses
    * duplicate keys map-side before the shuffle and a hot PK (one key with
    * millions of updates) reduces inside each task instead of piling into
    * one window partition. */
  def latestPerKey(changes: DataFrame, pks: Seq[String]): DataFrame = {
    val others = changes.columns.filterNot(pks.contains).toSeq
    changes
      .groupBy(pks.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct(col("_file_name"), col("_row_in_file"))).as("_best"))
      .select(pks.map(col) ++ others.map(o => col(s"_best.$o").as(o)): _*)
  }

  /** The window formulation of [[latestPerKey]] — same result (kept for
    * plan comparison and as documentation of the reference's shape). */
  def latestPerKeyWindow(changes: DataFrame, pks: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col("_file_name").desc, col("_row_in_file").desc)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Apply a raw change batch to a target snapshot; returns the new
    * snapshot with the target's schema. */
  def apply(target: DataFrame, changes: DataFrame, pks: Seq[String]): DataFrame =
    applyLatest(target, latestPerKey(changes, pks), pks)

  /** Same, but the change batch is already deduped to latest-per-PK
    * (lets callers reuse the deduped batch for metrics without
    * recomputing the window). */
  def applyLatest(target: DataFrame, latest: DataFrame, pks: Seq[String]): DataFrame = {
    require(pks.nonEmpty, "primary keys required for incremental merge (sql:303–305)")
    val targetCols = target.columns.toSeq
    // A NULL op is a no-op in the reference's MERGE (both `op = 'D'` and
    // `op <> 'D'` evaluate to NULL → no clause fires, sql:401–407), so a
    // PK whose LATEST row has a null op leaves the target row untouched —
    // drop such rows before building the touched-key set.
    val effective = latest.filter(col("op").isNotNull)
    // All touched PKs leave the target (delete-or-replace)…
    val touchedKeys = effective.select(pks.map(col): _*)
    val untouched = target.join(touchedKeys, pks, "left_anti")
    // …and rows whose latest op is not a tombstone come back (insert/update).
    val survivors = effective.filter(col("op") =!= "D")
      .select(targetCols.map(col): _*)
    untouched.unionByName(survivors)
  }
}
