package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage table-function read (S3, control_migration_schema_script.sql:359,
  * 388–391): scan headerless DMS CSV files, casting positional columns
  * `_c0.._cn` to the target schema (F9, sql:341–347) and exposing the two
  * file-metadata pseudo-columns the reference's MERGE depends on:
  *
  *  - `_file_name`  ← `metadata$filename` (Spark's hidden `_metadata.file_name`)
  *  - `_row_in_file` ← `metadata$file_row_number` (W4)
  *
  * Scale notes:
  *  - File pruning happens BEFORE the read: callers pass the exact file list
  *    (already filtered by watermark / pattern), which is stronger than a
  *    row-level filter — Spark never opens a skipped file (SURVEY §4).
  *  - `_row_in_file` uses a window over `monotonically_increasing_id()`
  *    partitioned by file. DMS change files are small (MB-scale), so each is
  *    a single split and intra-file order is preserved within its partition;
  *    the reader VERIFIES this against Spark's effective split size (see
  *    [[effectiveMaxSplitBytes]] — not raw `maxPartitionBytes`, which
  *    overstates the bound on small batches over many cores). The window
  *    shuffle is by file name — the same key the merge dedup needs anyway,
  *    and AQE coalesces the tiny partitions.
  */
object CsvStageReader {

  /** Read specific staged CSV files positionally cast to `target` schema.
    *
    * @param withOp if true, column 0 is the DMS op code (`$1::varchar(1) as
    *               op`, sql:291) and the data columns follow.
    * @param exactRowNumbers when true, `_row_in_file` is the exact 1-based
    *               per-file row number (W4 contract) — costs one window
    *               shuffle. When false, `_row_in_file` is only a MONOTONE
    *               ORDER within each file (`monotonically_increasing_id`,
    *               no shuffle) — sufficient for latest-per-key merges,
    *               which compare (file, row) lexicographically and never
    *               read the number itself. At change-batch scale this
    *               removes a full shuffle+sort of every batch.
    */
  def read(
      spark: SparkSession,
      files: Seq[String],
      target: StructType,
      withOp: Boolean,
      needRowNumbers: Boolean = true,
      exactRowNumbers: Boolean = true): DataFrame = {
    require(files.nonEmpty, "file list must be non-empty (probe first: A3)")
    // _row_in_file (exact OR order-only) is only correct when each CSV file
    // is a single split (Spark orders split partitions by size, not file
    // offset, so a split file would interleave). DMS change files are
    // MB-scale; enforce the assumption instead of silently mis-numbering.
    // Callers that don't use row numbers (full loads) skip the guard — and
    // the window.
    if (needRowNumbers) {
      val fs = new org.apache.hadoop.fs.Path(files.head)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val lens = files.map(f =>
        f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
      // Spark's EFFECTIVE split size is not maxPartitionBytes — it is
      // min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))
      // (FilePartition.maxSplitBytes), which on a small batch over many
      // cores collapses to openCostInBytes: a file well under 128 MB can
      // still be read as several splits. Recompute the same formula over
      // THIS file list so the guard checks the invariant the plan actually
      // runs under.
      val effSplit = effectiveMaxSplitBytes(spark, lens.map(_._2))
      lens.foreach { case (f, len) =>
        require(len <= effSplit,
          s"staged file $f is $len bytes > the effective Spark split size " +
            s"$effSplit (min(spark.sql.files.maxPartitionBytes, " +
            "max(spark.sql.files.openCostInBytes, totalBytes/parallelism))); " +
            "raise those confs so each DMS file stays a single split " +
            "(row-number contract)")
      }
    }
    val width = target.fields.length + (if (withOp) 1 else 0)
    // one probe column beyond the expected width: a DMS schema change
    // (column added upstream) makes staged rows WIDER than the target —
    // without the probe, the extra values are silently dropped and every
    // later column is positionally mis-bound. The reference re-derives the
    // stage schema from information_schema each run (sql:307–321); here
    // drift instead fails loudly inside the same scan (see [[parseStaged]]).
    val raw = spark.read
      .schema(probeSchema(width))
      .options(csvOptions)
      .csv(files: _*)
      .withColumn("_file_name", col("_metadata.file_name"))
    val projected = parseStaged(raw, target, withOp)
    if (!needRowNumbers) projected
    else if (!exactRowNumbers)
      projected.withColumn("_row_in_file", monotonically_increasing_id())
    else {
      val w = Window.partitionBy(col("_file_name")).orderBy(monotonically_increasing_id())
      projected.withColumn("_row_in_file", row_number().over(w))
    }
  }

  /** The split size Spark will ACTUALLY use for a scan over files of these
    * lengths — mirrors `FilePartition.maxSplitBytes` (Spark 4.x):
    * `min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartNum))`.
    * A file is a single split iff its length ≤ this value; comparing
    * against raw maxPartitionBytes alone overstates the bound whenever the
    * batch is small relative to the core count. */
  private[graft] def effectiveMaxSplitBytes(
      spark: SparkSession,
      fileLengths: Seq[Long]): Long = {
    def bytesConf(key: String, dflt: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(key, dflt))
    val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", "134217728b")
    val openCost = bytesConf("spark.sql.files.openCostInBytes", "4194304b")
    val minPartNum = spark.conf.getOption("spark.sql.files.minPartitionNum")
      .map(_.toInt)
      .orElse(spark.conf.getOption("spark.sql.leafNodeDefaultParallelism").map(_.toInt))
      .getOrElse(spark.sparkContext.defaultParallelism)
    val totalBytes = fileLengths.map(_ + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, minPartNum)
    math.min(maxPartitionBytes, math.max(openCost, bytesPerCore))
  }

  /** All-string positional schema `_c0.._c<width>` INCLUDING the drift
    * probe column at index `width`. */
  private[graft] def probeSchema(width: Int): StructType =
    StructType((0 to width).map(i => StructField(s"_c$i", StringType)))

  /** RFC-4180 quoting (DMS style): quotes escape by doubling, not
    * backslash (Spark's default escape of '\' mangles "" sequences). */
  private[graft] val csvOptions: Map[String, String] =
    Map("header" -> "false", "quote" -> "\"", "escape" -> "\"")

  /** The ONE staged-CSV parsing contract, shared by the batch reader and
    * [[graft.streaming.CdcStream]]: drift-guard filter + op extraction +
    * positional casts over a raw probe-widened `_c*` frame carrying
    * `_file_name`.
    *
    * The drift guard is a standalone FILTER on the probe column: any
    * populated probe cell aborts the scan naming the file, instead of
    * positionally mis-casting the whole batch. A Filter referencing
    * `_c$width` keeps the probe column alive through Catalyst column
    * pruning no matter which data columns a downstream projection consumes
    * (a guard fused into one data column's expression would vanish with
    * that column). A column REMOVED upstream is indistinguishable from
    * legitimate trailing NULLs row-wise and surfaces as such — only
    * widening is detectable here. */
  private[graft] def parseStaged(
      raw: DataFrame,
      target: StructType,
      withOp: Boolean): DataFrame = {
    val offset = if (withOp) 1 else 0
    val width = target.fields.length + offset
    val opCol: Seq[Column] =
      if (withOp) Seq(substring(col("_c0"), 1, 1).as("op")) else Seq.empty
    val driftMsg = concat(
      lit("schema drift: staged file "), col("_file_name"),
      lit(s" carries more than ${target.fields.length} data columns " +
        s"(target schema: ${target.fields.map(_.name).mkString(", ")}); " +
        "re-baseline with a full load or widen the target first"))
    val guarded = raw.filter(
      when(col(s"_c$width").isNotNull, raise_error(driftMsg).cast("boolean"))
        .otherwise(lit(true)))
    val dataCols = target.fields.zipWithIndex.map { case (f, i) =>
      col(s"_c${i + offset}").cast(f.dataType).as(f.name)
    }
    guarded.select(opCol ++ dataCols :+ col("_file_name"): _*)
  }
}
