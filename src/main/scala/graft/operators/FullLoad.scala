package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.meta.{MetaStore, TableMeta}
import graft.sources.{CsvStageReader, DmsFileClassifier, StageListing}

/** Full (re)load of one table from its staged `LOAD*.csv` files
  * (control_migration_schema_script.sql:215–260).
  *
  * Reference behaviour preserved:
  *  - only files matching the full-load pattern are read (sql:235) — file
  *    pruning at the source, not a row filter;
  *  - the target is replaced wholesale; we use [[TableStore]]'s atomic
  *    version swap instead of TRUNCATE+COPY (sql:238–243) so readers never
  *    see an empty table mid-load;
  *  - afterwards the incremental watermark resets to `"0"` so every change
  *    file replays on top of the fresh snapshot (sql:244).
  *
  * @return rows loaded (A5 analog, sql:255)
  */
object FullLoad {

  def run(
      spark: SparkSession,
      meta: TableMeta,
      stageDir: String,
      store: TableStore,
      metaStore: MetaStore,
      schema: StructType): Long = {
    val tableDir = s"$stageDir/${meta.dbSchema}/${meta.dbTable}"
    val files = StageListing.listFiles(spark, tableDir)
      .filter(f => f.file.matches(DmsFileClassifier.fullLoadRegex))
    require(files.nonEmpty, s"no full-load files under $tableDir")
    val df = CsvStageReader.read(spark, files.map(_.file), schema,
        withOp = false, needRowNumbers = false) // full loads don't need per-file row numbers
      .drop("_file_name")
    // Rows-affected (A5, sql:255) comes from the write pass itself via
    // Observation metrics — never a second scan of the snapshot, which at
    // the target scale would double the cost of every full load.
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    // additional_config {"buckets": N} (sql:34) opts the target into the
    // PK-hash bucketed layout: one clustering shuffle here buys every
    // incremental merge its touched-bucket pruning (see TableStore).
    meta.bucketCount match {
      case Some(n) if meta.pkColumns.nonEmpty =>
        store.writeBucketed(observed, meta.targetTableName, BucketSpec(n, meta.pkColumns))
      case _ =>
        store.write(observed, meta.targetTableName)
    }
    val loadDate = new Timestamp(files.map(_.last_modified.getTime).max)
    metaStore.resetAfterFullLoad(meta.fullPath, loadDate)
    obs.get("rows").asInstanceOf[Long]
  }
}
