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
    store.write(df, meta.targetTableName)
    val loadDate = new Timestamp(files.map(_.last_modified.getTime).max)
    metaStore.resetAfterFullLoad(meta.fullPath, loadDate)
    store.read(spark, meta.targetTableName).count()
  }
}
