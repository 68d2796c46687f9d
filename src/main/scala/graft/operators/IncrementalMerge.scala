package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, greatest, lit, max, when}
import graft.meta.{MetaStore, TableMeta}
import graft.sources.{CsvStageReader, StageListing}

/** Incremental merge of one table's pending change files — the reference's
  * flagship operator `incremental_load`
  * (control_migration_schema_script.sql:271–428).
  *
  * Pipeline (SURVEY Entry 3), Spark-first:
  *  1. schema discovery (S8): the target parquet's own `StructType` replaces
  *     the reference's `information_schema.columns` string metaprogramming;
  *  2. watermark probe (A3 + P5): list the table's stage dir, keep change
  *     files with name LEXICOGRAPHICALLY > `last_incremental_file` — string
  *     compare, never parsed to timestamps; the `"0"` sentinel sorts below
  *     every real DMS file name. Empty list → early exit, target untouched
  *     (sql:421–423);
  *  3. read ONLY those files (file-list pruning beats any row filter — the
  *     skipped files are never opened);
  *  4. [[ChangeApplier]]: latest-per-PK dedup + tombstone + join-upsert;
  *  5. atomic version swap, THEN watermark advance (sql:412–416) — a crash
  *     between the two replays the batch idempotently.
  *
  * @return rows in the applied (deduped) batch, the reference's
  *         rows-affected proxy (A5, sql:418); -1 when nothing to process.
  */
object IncrementalMerge {

  def run(
      spark: SparkSession,
      meta: TableMeta,
      stageDir: String,
      store: TableStore,
      metaStore: MetaStore): Long = {
    val tableDir = s"$stageDir/${meta.dbSchema}/${meta.dbTable}"
    // Shared with SyncPlanner.summarize (see DmsFileClassifier.changeFileRegex
    // for why the strict shape matters).
    val changeRe = graft.sources.DmsFileClassifier.changeFileRegex
    val pending = StageListing.listFiles(spark, tableDir)
      .filter(f => f.file.matches(changeRe))
      .filter(f => fileName(f.file) > meta.lastIncrementalFile) // P5: string >
    if (pending.isEmpty) return -1L // "No files to process." (sql:422)

    // out-of-band rename/drop policing (SchemaEvolution scaladoc): when
    // the metadata declares the upstream column list, a rename / drop /
    // reorder fails HERE with its remediation instead of positionally
    // mis-casting the batch. Adds pass — the in-band widen path owns
    // them. Control-plane: one string comparison, no Spark job.
    meta.configValue("declared_columns").foreach { declared =>
      SchemaEvolution.check(meta.targetTableName,
        declared.replaceAll(" ", "").split(",").filter(_.nonEmpty).toSeq,
        store.read(spark, meta.targetTableName).schema.fieldNames.toSeq,
        // declared rename map: the sanctioned old→new bridge — mapped
        // renames pass (positionally harmless), unmapped drift stays loud
        meta.configObject("renames"))
    }

    def mergeOnce(): Long = {
      val target = store.read(spark, meta.targetTableName)
      // order-only row ids: latest-per-PK compares (file, row) lexicographically
      // and never reads the row number itself — skipping the exact-numbering
      // window removes a full shuffle+sort of every change batch
      val changes = CsvStageReader.read(spark, pending.map(_.file), target.schema,
        withOp = true, exactRowNumbers = false)
      val pks = meta.pkColumns
      val batch = ChangeApplier.latestPerKey(changes, pks).cache()
      try applyBatch(spark, store, meta.targetTableName, batch, pks)
      finally batch.unpersist()
    }

    // additional_config {"widen_on_drift": true} opts the table into
    // schema evolution: a change batch carrying k new TRAILING columns
    // widens the target (metadata-only, TableStore.widenSchema) and
    // merges; every other mismatch keeps the loud drift failure.
    //
    // OPTIMISTIC: merge first and let the scan's own drift guard trip —
    // only then pay the full-width probe + widen + one retry. The previous
    // shape probed every pending file up front on EVERY merge, roughly
    // doubling steady-state ingest reads for widen_on_drift tables to
    // defend against the rare batch. Retry safety: nothing commits before
    // the drift error (writes land in TableStore staging dirs; the
    // watermark advances after), so the re-run is the same idempotent
    // replay a crash would get.
    val rows =
      if (!meta.configValue("widen_on_drift").contains("true")) mergeOnce()
      else
        try mergeOnce()
        catch {
          case e: Throwable if isDriftError(e) =>
            widenIfBatchIsWider(spark, store, meta.targetTableName, pending.map(_.file))
            mergeOnce()
        }
    metaStore.advanceIncremental(meta.fullPath, pending.map(f => fileName(f.file)).max)
    rows
  }

  /** The scan-level drift guard's signature anywhere in the failure chain
    * ([[CsvStageReader.parseStaged]] raises it naming the file). */
  private def isDriftError(e: Throwable): Boolean = {
    var t = e
    while (t != null) {
      if (t.getMessage != null && t.getMessage.contains("schema drift: staged file"))
        return true
      t = t.getCause
    }
    false
  }

  /** Apply a deduped (latest-per-PK) change batch to the stored table —
    * shared by the batch merge above and the Structured-Streaming path
    * ([[graft.streaming.CdcStream]]).
    *
    * Bucketed targets take the copy-on-write path: rewrite ONLY the buckets
    * the batch touches; every other bucket rides into the next version as a
    * file link. Merge cost becomes ∝ touched data, not target size — the
    * one structural requirement for applying a ~GB change batch to a
    * ~100 TB table (the reference's warehouse gets this from clustered
    * tables, sql:369–411).
    *
    * @param mergeFilesPerBucket write-parallelism knob forwarded to
    *        [[TableStore.commitBucketMerge]] — raise at cluster scale so a
    *        multi-GB bucket's rewrite splits across tasks
    * @param compactAboveFiles opportunistic maintenance: after the merge
    *        commit, any bucket that accumulated more part-files than this
    *        is rewritten to one file ([[TableStore.compact]]); a no-op
    *        metadata check on healthy tables
    * @return rows in the (deduped) batch — the rows-affected proxy; on the
    *         bucketed path it rides along with the touched-bucket probe so
    *         no separate count job runs */
  def applyBatch(
      spark: SparkSession,
      store: TableStore,
      tableName: String,
      batch: org.apache.spark.sql.DataFrame,
      pks: Seq[String],
      mergeFilesPerBucket: Int = 1,
      compactAboveFiles: Int = 32): Long =
    store.bucketSpec(tableName) match {
      // set-compare: the layout's OWN pk order drives the bucket hash
      // (spec.bucketColumn), so a metadata row listing the same keys in a
      // different order still rides the copy-on-write path
      case Some(spec) if spec.pks.toSet == pks.toSet =>
        val batchBuckets = batch.withColumn("_bucket", spec.bucketColumn)
        // ≤ nBuckets result rows — control-plane collect, like the file
        // listing; one job yields both the touched set and rows-affected
        val bucketCounts = batchBuckets.groupBy("_bucket")
          .agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1))
        val touched = bucketCounts.map(_._1).toSet
        // snapshot: pin version at read so the commit CASes against the
        // version this merge actually derived from, not commit-time head
        val (rawTarget, readVersion) = store.snapshotRaw(spark, tableName)
        val prunedTarget = rawTarget
          .filter(col("_bucket").isin(touched.toSeq.map(Integer.valueOf): _*))
          .drop("_bucket") // dir-level pruning: untouched buckets never open
        val merged = ChangeApplier.applyLatest(prunedTarget, batch, pks)
          .withColumn("_bucket", spec.bucketColumn)
        store.commitBucketMerge(merged, tableName, touched, mergeFilesPerBucket, readVersion)
        store.compact(spark, tableName, compactAboveFiles)
        bucketCounts.map(_._2).sum
      case Some(spec) =>
        // falling through to store.write would commit the next version
        // WITHOUT the spec — silently un-bucketing the table and turning
        // every later merge into a full rewrite. Config drift fails loudly
        // here, like every other drift path in this codebase.
        throw new IllegalStateException(
          s"$tableName is bucketed on (${spec.pks.mkString(", ")}) but the merge " +
            s"was asked to key on (${pks.mkString(", ")}); fix the table metadata " +
            "or re-baseline with a full load under the new keys")
      case None =>
        val (target, readVersion) = store.snapshot(spark, tableName)
        store.write(
          ChangeApplier.applyLatest(target, batch, pks), tableName, Some(readVersion))
        batch.count() // cached by the caller; cheap second action
    }

  /** How many probe columns beyond (op + target) the width scan watches —
    * also the per-batch widening limit; wider drift stays a loud failure. */
  private val widenWindow = 8

  /** Probe the pending change files' real column count (one narrow scan —
    * the same per-run schema rediscovery the reference pays via
    * information_schema, sql:307–321) and widen the target when the batch
    * carries k ≤ [[widenWindow]] new trailing columns. New columns are
    * nullable strings named `c<ordinal>` (headerless DMS CSVs carry no
    * names; the ordinal mirrors the reference's positional `$n` binding) —
    * callers cast/rename downstream. A REMOVED upstream column is
    * indistinguishable from trailing nulls row-wise and never widens. */
  private def widenIfBatchIsWider(
      spark: SparkSession,
      store: TableStore,
      tableName: String,
      files: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val targetSchema = store.read(spark, tableName).schema
    val width = 1 + targetSchema.length // op + data columns
    // one LOOKAHEAD column past the window: with it, a batch carrying
    // exactly widenWindow new columns is distinguishable from one carrying
    // more (whose overflow populates the lookahead slot)
    val total = width + widenWindow + 1
    val probeSchema = StructType((0 until total).map(i => StructField(s"_c$i", StringType)))
    val raw = spark.read.schema(probeSchema)
      .option("header", "false").option("quote", "\"").option("escape", "\"")
      .csv(files: _*)
    val lastIdx = greatest((0 until total).map(i =>
      when(col(s"_c$i").isNotNull, lit(i)).otherwise(lit(-1))): _*)
    val maxIdx = raw.agg(max(lastIdx).as("m")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Int]))
      .getOrElse(-1)
    if (maxIdx >= width) {
      require(maxIdx < total - 1,
        s"change files for $tableName carry ${maxIdx + 1}+ columns — over " +
          s"$widenWindow beyond the target's ${targetSchema.length}; " +
          "re-baseline with a full load")
      val k = maxIdx - width + 1
      val extra = (1 to k).map(j =>
        StructField(s"c${targetSchema.length + j}", StringType, nullable = true))
      store.widenSchema(spark, tableName, extra)
    }
  }

  private def fileName(path: String): String = path.substring(path.lastIndexOf('/') + 1)
}
