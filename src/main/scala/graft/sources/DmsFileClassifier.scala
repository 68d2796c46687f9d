package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filename conventions of a DMS-style CSV export stage.
  *
  * The reference (control_migration_schema_script.sql:130–132, 235, 301)
  * distinguishes full-load files `LOAD<8 digits>.csv` from change files
  * `2<timestamp>.csv` whose names sort lexicographically by time — the
  * string order IS the clock (SURVEY §2.9). We keep the exact regexes.
  */
object DmsFileClassifier {

  /** sql:130 — strip the filename to get the table prefix (directory). */
  val fileSuffixRegex = "/(LOAD[0-9]{8}|2[0-9]{7}-[0-9]{9})\\..*$"

  /** sql:131 — is this a full-load file? */
  val fullLoadRegex = ".*/LOAD[0-9]+\\..*$"

  /** Strict change-file name test: `2<7 digits>-<9 digits>.csv` (sql:130).
    * Tighter than the reference's `2.*\.csv` scan glob (sql:301) on purpose:
    * planner and merge must agree on what counts as a change file, or a
    * stray name sorting above the watermark (`2backup.csv`, `_SUCCESS`)
    * becomes a permanent phantom work item — the planner keeps emitting 'I'
    * while the merge finds nothing and the watermark never advances. */
  val changeFileRegex = ".*/2[0-9]{7}-[0-9]{9}\\.csv$"

  /** Change-file test (the planner/merge shared gate). */
  def isChangeFile(file: Column): Column = file.rlike(changeFileRegex)

  /** sql:235 — full-load scan pattern for one table dir. */
  def fullLoadPattern: String = "LOAD[0-9]*.csv" // glob form for pathGlobFilter

  /** sql:301 — incremental (change) scan pattern for one table dir. */
  def incrementalPattern: String = "2*.csv" // glob form

  /** Table prefix of a staged file path (F1, sql:130). */
  def filePrefix(file: Column): Column = regexp_replace(file, fileSuffixRegex, "")

  /** Full-load test (F2, sql:131). */
  def isFullLoad(file: Column): Column = file.rlike(fullLoadRegex)

  /** Bare file name relative to the stage root (F4, sql:131): the reference
    * strips `s3://bucket` by locating the first '/' from position 6. We keep
    * the same 3-arg-POSITION semantics via `locate(str, col, pos)`. */
  def relativeName(file: Column): Column =
    substring_index(file, "://", -1) // scheme-agnostic: drop "<scheme>://"

  /** HTTP-date parse (F6, sql:132): the reference parses S3's last-modified
    * `'DY, DD MON YYYY HH24:MI:SS GMT'` strings; our native listing returns
    * a real timestamp so this only exists for stages that surface
    * HTTP-style dates. */
  def httpDate(col: Column): Column =
    // day-of-week text is format-only in Spark 3+ parse patterns — drop the
    // redundant "DY, " prefix before parsing
    to_timestamp(regexp_replace(col, "^[A-Za-z]{3}, ", ""), "dd MMM yyyy HH:mm:ss 'GMT'")

  /** Path components per the reference's 6 regexp-extracts
    * (fill_dms_metadata, sql:442–447): provider://bucket/prefix/schema/table/file. */
  def pathParts(file: Column): (Column, Column, Column, Column, Column) = {
    val re = "^([a-z0-9]+)://([^/]+)/(.*)/([^/]+)/([^/]+)/([^/]+)$"
    (regexp_extract(file, re, 1), // provider
      regexp_extract(file, re, 2), // bucket
      regexp_extract(file, re, 4), // schema
      regexp_extract(file, re, 5), // table
      regexp_extract(file, re, 6)) // file name
  }
}
