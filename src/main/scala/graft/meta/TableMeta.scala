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

  /** Flat string/number lookup into the `additional_config` VARIANT column
    * (sql:34) — the reference carries per-table JSON options; we parse the
    * flat keys with the same stdlib-only discipline as
    * [[MetaStore]]'s codec (control-plane, one row per table). */
  def configValue(key: String): Option[String] = {
    val re = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*(?:\"((?:[^\"\\\\]|\\\\.)*)\"|(-?[0-9.]+)|(true|false))").r
    re.findFirstMatchIn(additionalConfig)
      .map(m => Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3)))
  }

  /** One-level string→string OBJECT lookup into `additional_config`
    * (`{"renames": {"old": "new", ...}}` — the declared CDC rename map,
    * [[graft.operators.SchemaEvolution]]): same stdlib-only regex
    * discipline as [[configValue]]; nested objects beyond one level are
    * not a shape the control table carries. Returns empty when the key
    * is absent or not an object. */
  def configObject(key: String): Map[String, String] = {
    val obj = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\\{([^}]*)\\}").r
    obj.findFirstMatchIn(additionalConfig).map { m =>
      val pair = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      pair.findAllMatchIn(m.group(1)).map(p => p.group(1) -> p.group(2)).toMap
    }.getOrElse(Map.empty)
  }

  /** PK-hash bucket count for the target table's layout
    * (`additional_config: {"buckets": N}`) — enables the copy-on-write
    * bucketed merge path in [[graft.operators.IncrementalMerge]]. */
  def bucketCount: Option[Int] =
    configValue("buckets").flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ > 0)

  /** Name of the target table in the warehouse ([[graft.operators.TableStore]]). */
  def targetTableName: String =
    if (targetTable.nonEmpty) targetTable else s"${dbSchema}_$dbTable"
}
