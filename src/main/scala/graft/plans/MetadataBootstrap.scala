package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.TableMeta
import graft.sources.{DmsFileClassifier, StageListing}

/** `fill_dms_metadata` analog (control_migration_schema_script.sql:431–481):
  * bootstrap the metadata table by listing a stage and regexp-parsing
  * `provider://bucket/prefix/schema/table/file` paths (F3 ×6 → DISTINCT).
  *
  * The reference inserts row-at-a-time with bound params (S7,
  * sql:467–471); here the whole discovery is one declarative pipeline and
  * one batch write — never row-at-a-time in Spark.
  */
object MetadataBootstrap {

  /** Distinct (schema, table, prefix) triples discovered in a stage. */
  def discover(spark: SparkSession, stageName: String, stageDir: String): DataFrame = {
    val listing = StageListing.list(spark, stageDir)
      .withColumn("stage", lit(stageName))
    // Local paths have no URI scheme; parse `<stageDir>/<schema>/<table>/<file>`.
    val rel = regexp_replace(col("file"), "^.*?" + java.util.regex.Pattern.quote(stageDir.stripSuffix("/")) + "/", "")
    listing
      .withColumn("db_schema", element_at(split(rel, "/"), -3))
      .withColumn("db_table", element_at(split(rel, "/"), -2))
      .withColumn("full_path", DmsFileClassifier.filePrefix(col("file")))
      .select("stage", "db_schema", "db_table", "full_path")
      .distinct()
  }

  def bootstrap(
      spark: SparkSession,
      stageName: String,
      stageDir: String,
      primaryKeys: Map[String, String]): Seq[TableMeta] =
    discover(spark, stageName, stageDir).collect().toSeq
      .map { r =>
        val tbl = r.getAs[String]("db_table")
        TableMeta(
          fullPath = r.getAs[String]("full_path"),
          dbTable = tbl,
          dbSchema = r.getAs[String]("db_schema"),
          stage = stageName,
          primaryKeys = primaryKeys.getOrElse(tbl, ""))
      }
      .sortBy(_.fullPath)
}
