package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.DataFrame

/** Warehouse write side — the output half of the reference's pipeline
  * (control_migration_schema_script.sql:369–411 publishes every sync into a
  * warehouse table; the read half is [[graft.sources.JdbcTableSource]]).
  *
  * Split of labor designed for the target scale:
  *  - the DATA volume moves in the distributed phase: executors write their
  *    partitions straight into a staging table over JDBC with batched
  *    inserts (Spark's `batchsize`, one connection per partition task) —
  *    the driver never holds rows;
  *  - the PUBLISH step is metadata/set-based SQL on a single control
  *    connection, one transaction: staging-swap for snapshots,
  *    delete+insert keyed on the PK for change batches. Cheap regardless
  *    of table size, and idempotent — a replayed batch or a crashed+rerun
  *    publish converges to the same final state, mirroring the
  *    version-swap-then-advance-watermark discipline of
  *    [[graft.operators.TableStore]] / [[graft.operators.IncrementalMerge]].
  *
  * SQL is deliberately vanilla (DROP/RENAME/DELETE WHERE EXISTS/INSERT
  * SELECT) so it runs on the embedded Derby available offline; a warehouse
  * dialect would swap `RENAME TABLE` for its native atomic table swap and
  * the delete+insert pair for its `MERGE`.
  */
object JdbcTableSink {

  /** Publish a full snapshot: distributed batched write into
    * `<table>_STG`, then drop-and-rename inside one transaction. Safe to
    * re-run from scratch after a crash at any point (the staging write is
    * `overwrite`; the swap is transactional). */
  def snapshotOverwrite(
      df: DataFrame,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val stg = s"${table}_STG"
    // Same VARCHAR staging as applyChanges: without it a Derby-like dialect
    // creates CLOB string columns, and a later applyChanges against this
    // published table fails on the PK equality predicate.
    df.write.mode("overwrite").options(props)
      .options(stringColsAsVarchar(df))
      .jdbc(url, stg, toProps(props))
    withTxn(url, props) { conn =>
      if (tableExists(conn, table)) exec(conn, s"DROP TABLE $table")
      exec(conn, s"RENAME TABLE $stg TO $table")
    }
  }

  /** Apply one deduped CDC batch (the output of
    * [[graft.operators.ChangeApplier.latestPerKey]]: latest row per PK,
    * `op` ∈ I/U/D) to a JDBC target:
    *
    *  1. distributed write of the batch into `<table>_CHG`;
    *  2. one transaction: delete every targeted PK, re-insert the non-
    *     tombstoned rows, drop the staging table.
    *
    * Replaying the same batch is a no-op by construction (delete+insert of
    * identical rows), matching the merge's crash-replay idempotence
    * (sql:412–416). */
  def applyChanges(
      batch: DataFrame,
      url: String,
      table: String,
      pks: Seq[String],
      opCol: String = "op",
      props: Map[String, String] = Map.empty): Unit = {
    require(pks.nonEmpty, "applyChanges needs at least one primary-key column")
    val stg = s"${table}_CHG"
    batch.write.mode("overwrite").options(props)
      .options(stringColsAsVarchar(batch))
      .jdbc(url, stg, toProps(props))
    // Spark's JDBC writer creates the staging table with QUOTED column
    // names in the DataFrame's exact case — generate the publish SQL with
    // the same quoting, so the batch's column names must match the
    // target's physical names exactly (they do when both sides originate
    // from the same schema, the normal sync case).
    val pkMatch = pks.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val dataCols = batch.columns.filterNot(_.equalsIgnoreCase(opCol))
    val colList = dataCols.map(q).mkString(", ")
    withTxn(url, props) { conn =>
      exec(conn,
        s"DELETE FROM $table t WHERE EXISTS (SELECT 1 FROM $stg s WHERE $pkMatch)")
      exec(conn,
        s"INSERT INTO $table ($colList) SELECT $colList FROM $stg WHERE ${q(opCol)} <> 'D'")
      exec(conn, s"DROP TABLE $stg")
    }
  }

  private def q(ident: String): String = "\"" + ident + "\""

  /** Some dialects (Derby) map StringType to CLOB, which cannot appear in
    * equality/inequality predicates — stage string columns as VARCHAR so
    * the publish SQL can compare them. */
  private def stringColsAsVarchar(df: DataFrame): Map[String, String] = {
    val strings = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
    if (strings.isEmpty) Map.empty
    else Map("createTableColumnTypes" ->
      strings.map(f => s"${f.name} VARCHAR(4000)").mkString(", "))
  }

  private def withTxn[T](url: String, props: Map[String, String])(f: Connection => T): T = {
    val p = toProps(props)
    val conn =
      if (p.isEmpty) DriverManager.getConnection(url)
      else DriverManager.getConnection(url, p)
    try {
      conn.setAutoCommit(false)
      val out =
        try { val r = f(conn); conn.commit(); r }
        catch { case e: Throwable => conn.rollback(); throw e }
      out
    } finally conn.close()
  }

  private def tableExists(conn: Connection, table: String): Boolean = {
    // unquoted identifiers are stored upper-case by Derby/Oracle-style
    // catalogs; check both spellings
    val md = conn.getMetaData
    Seq(table.toUpperCase, table).exists { t =>
      val rs = md.getTables(null, null, t, Array("TABLE"))
      try rs.next() finally rs.close()
    }
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def toProps(m: Map[String, String]): Properties = {
    val p = new Properties()
    m.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}
