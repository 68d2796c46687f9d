package graft.meta

import java.sql.Timestamp

/** One row of the DMS_METADATA control table
  * (control_migration_schema_script.sql:20–37), Spark-idiomatic: a case
  * class instead of string-built DDL. Field names follow the reference.
  *
  * @param fullPath            stage-relative table prefix — the PK the queue
  *                            and watermark updates key on (sql:244, 412)
  * @param primaryKeys         comma-separated PK column list; may contain
  *                            spaces (sql:298)
  * @param lastFullLoadDate    watermark: newest full-load file mtime
  * @param lastIncrementalFile watermark: max change-file name processed,
  *                            LEXICOGRAPHIC (P5) — `"0"` sentinel sorts
  *                            below every real file name (sql:244)
  */
final case class TableMeta(
    fullPath: String,
    dbTable: String,
    dbSchema: String,
    stage: String,
    fileFormat: String = "csv",
    primaryKeys: String = "",
    targetTable: String = "",
    additionalConfig: String = "{}",
    lastFullLoadDate: Option[Timestamp] = None,
    lastIncrementalFile: String = "0") {

  /** Parsed PK columns — reference's JS `replace(/ /g,'').split(',')`
    * (F11, sql:298–299). */
  def pkColumns: Seq[String] =
    primaryKeys.replaceAll(" ", "").split(",").filter(_.nonEmpty).toSeq

  /** Name of the target table in the warehouse ([[graft.operators.TableStore]]). */
  def targetTableName: String =
    if (targetTable.nonEmpty) targetTable else s"${dbSchema}_$dbTable"
}
