package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Durable store for [[TableMeta]] + watermarks (S10,
  * control_migration_schema_script.sql:244, 412–416).
  *
  * The control table is tiny (one row per migrated table), so it lives as a
  * single JSON-lines file updated with write-temp-then-atomic-rename — the
  * watermark update after a successful load is the reference's only
  * transactional write, and rename-on-same-filesystem gives us the same
  * all-or-nothing property without a table format. A crash between data
  * write and watermark advance replays the batch; the merge dedup is
  * idempotent so replays are safe (SURVEY §2.9 exactly-once-ish).
  */
final class MetaStore(dir: String) {
  private val file: Path = Paths.get(dir, "dms_metadata.jsonl")
  Files.createDirectories(Paths.get(dir))

  // -- minimal JSON codec (stdlib only; control-plane, never hot path) -----
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def unesc(s: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def toJson(m: TableMeta): String = {
    val fields = Seq(
      "full_path" -> m.fullPath, "db_table" -> m.dbTable, "db_schema" -> m.dbSchema,
      "stage" -> m.stage, "file_format" -> m.fileFormat, "primary_keys" -> m.primaryKeys,
      "target_table" -> m.targetTable, "additional_config" -> m.additionalConfig,
      "last_full_load_date" -> m.lastFullLoadDate.map(_.getTime.toString).getOrElse(""),
      "last_incremental_file" -> m.lastIncrementalFile)
    fields.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
  }

  private val fieldRe = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r
  private def fromJson(line: String): TableMeta = {
    val kv = fieldRe.findAllMatchIn(line).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
    TableMeta(
      fullPath = kv("full_path"), dbTable = kv("db_table"), dbSchema = kv("db_schema"),
      stage = kv("stage"), fileFormat = kv.getOrElse("file_format", "csv"),
      primaryKeys = kv.getOrElse("primary_keys", ""),
      targetTable = kv.getOrElse("target_table", ""),
      additionalConfig = kv.getOrElse("additional_config", "{}"),
      lastFullLoadDate = kv.get("last_full_load_date").filter(_.nonEmpty).map(s => new Timestamp(s.toLong)),
      lastIncrementalFile = kv.getOrElse("last_incremental_file", "0"))
  }

  // ------------------------------------------------------------------ CRUD
  // Mutations are read-modify-write over the whole file, and orchestrator
  // workers update different tables concurrently — serialize them on this
  // instance so no update is lost (the file move itself is atomic, but two
  // interleaved loadAll→saveAll cycles would drop one row's change).
  def loadAll(): Seq[TableMeta] =
    if (!Files.exists(file)) Seq.empty
    else Files.readAllLines(file, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.trim.nonEmpty).map(fromJson)

  def get(fullPath: String): Option[TableMeta] = loadAll().find(_.fullPath == fullPath)

  def saveAll(metas: Seq[TableMeta]): Unit = this.synchronized {
    val tmp = Paths.get(file.toString + ".tmp")
    Files.write(tmp, metas.map(toJson).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def upsert(meta: TableMeta): Unit = this.synchronized {
    saveAll(loadAll().filterNot(_.fullPath == meta.fullPath) :+ meta)
  }

  /** Watermark advance after a successful incremental merge (sql:412–416). */
  def advanceIncremental(fullPath: String, lastFile: String): Unit = this.synchronized {
    saveAll(loadAll().map(m =>
      if (m.fullPath == fullPath) m.copy(lastIncrementalFile = lastFile) else m))
  }

  /** Watermark reset after a full load (sql:244): stamp the load date and
    * reset the incremental watermark to the `"0"` sentinel so ALL change
    * files replay on top of the fresh snapshot. */
  def resetAfterFullLoad(fullPath: String, loadDate: Timestamp): Unit = this.synchronized {
    saveAll(loadAll().map(m =>
      if (m.fullPath == fullPath)
        m.copy(lastFullLoadDate = Some(loadDate), lastIncrementalFile = "0")
      else m))
  }
}
