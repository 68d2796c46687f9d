package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path, RemoteIterator}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `LIST @stage` analog (S1, control_migration_schema_script.sql:104, 437):
  * recursive listing of a stage directory → DataFrame(file, size, last_modified).
  *
  * Uses the Hadoop FileSystem API directly (one RPC-batched recursive
  * listing) rather than a Spark read — listing is control-plane work over
  * file *names*; at 100 TB the file count (≈10⁵–10⁶) still fits the driver
  * comfortably and avoids spinning up a job just to enumerate paths. The
  * result is returned as a DataFrame so the planner's A2/J1 pipeline stays
  * declarative (and distributable if a stage ever has >10⁷ objects).
  */
object StageListing {

  final case class StagedFile(file: String, size: Long, last_modified: java.sql.Timestamp)

  def listFiles(spark: SparkSession, stageDir: String): Seq[StagedFile] = {
    val path = new Path(stageDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Seq.empty
    val it: RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = fs.listFiles(path, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[StagedFile]
    while (it.hasNext) {
      val st = it.next()
      // Normalize local paths (file:/x → /x) so prefixes join cleanly with
      // metadata full_path values; non-local URIs keep their scheme.
      val p = st.getPath
      val name = if (p.toUri.getScheme == "file") p.toUri.getPath else p.toString
      buf += StagedFile(name, st.getLen, new java.sql.Timestamp(st.getModificationTime))
    }
    buf.toSeq.sortBy(_.file)
  }

  /** Listing as a DataFrame with the reference's LIST columns. */
  def list(spark: SparkSession, stageDir: String): DataFrame = {
    import spark.implicits._
    listFiles(spark, stageDir).toDF()
  }

  /** Union of listings over several stages (U1, sql:101–109), each row
    * tagged with its stage. Snowflake `UNION` is distinct; stages are
    * disjoint so distinct is a semantic no-op, but we keep it for fidelity.
    */
  def listAll(spark: SparkSession, stages: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val dfs = stages.toSeq.sortBy(_._1).map { case (name, dir) =>
      list(spark, dir).withColumn("stage", lit(name))
    }
    dfs.reduce(_ unionByName _).distinct()
  }
}
