package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.sinks.JdbcTableSink
import graft.sources.JdbcTableSource

/** End-to-end JDBC warehouse sync against embedded Derby: snapshot publish
  * (staging-then-swap) followed by an incremental change batch, both
  * replay-idempotent — the reference's output side (sql:369–411) closed
  * over the existing [[JdbcTableSource]] read side.
  */
class JdbcTableSinkSpec extends SparkSpec {

  private def derbyUrl(name: String): String =
    s"jdbc:derby:${tmpDir(name)}/db;create=true"

  private def queryAll(url: String, sql: String): Seq[(Long, String, Double)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getDouble(3)))
      buf.toSeq
    } finally conn.close()
  }

  test("snapshot publish + incremental change batch, both replay-idempotent") {
    val srcUrl = derbyUrl("derby_src")
    val whUrl = derbyUrl("derby_wh")

    // upstream source database
    val src = DriverManager.getConnection(srcUrl)
    try {
      val st = src.createStatement()
      st.execute("CREATE TABLE src_orders (id BIGINT PRIMARY KEY, status VARCHAR(4), amount DOUBLE)")
      val ins = src.prepareStatement("INSERT INTO src_orders VALUES (?, ?, ?)")
      (1 to 50).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, if (i % 2 == 0) "O" else "F")
        ins.setDouble(3, i * 2.0); ins.addBatch()
      }
      ins.executeBatch()
    } finally src.close()

    // ---- snapshot: distributed JDBC read -> staged swap into the warehouse
    val snapshot = JdbcTableSource.readPartitioned(spark, srcUrl, "src_orders", "id", 4)
    JdbcTableSink.snapshotOverwrite(snapshot, whUrl, "wh_orders")
    assert(queryAll(whUrl, "SELECT id, status, amount FROM wh_orders ORDER BY id").size === 50)

    // re-publishing the same snapshot converges to the same state
    JdbcTableSink.snapshotOverwrite(snapshot, whUrl, "wh_orders")
    val afterSnap = queryAll(whUrl, "SELECT id, status, amount FROM wh_orders ORDER BY id")
    assert(afterSnap.size === 50)
    assert(afterSnap.head === ((1L, "F", 2.0)))

    // ---- incremental: latest-per-PK change batch (U/D/I ops)
    val s = spark; import s.implicits._
    // column names match the target's physical (catalog-folded) names —
    // the sink's documented contract
    val batch = Seq(
      ("U", 1L, "X", 99.0), // update existing
      ("D", 2L, "O", 4.0), // tombstone existing
      ("I", 51L, "N", 102.0)) // brand-new key
      .toDF("OP", "ID", "STATUS", "AMOUNT")
    JdbcTableSink.applyChanges(batch, whUrl, "wh_orders", pks = Seq("ID"), opCol = "OP")

    def state() = queryAll(whUrl, "SELECT id, status, amount FROM wh_orders ORDER BY id")
    val after = state()
    assert(after.size === 50) // 50 - 1 delete + 1 insert
    assert(after.find(_._1 == 1L).get === ((1L, "X", 99.0)))
    assert(!after.exists(_._1 == 2L))
    assert(after.find(_._1 == 51L).get === ((51L, "N", 102.0)))

    // replaying the same batch is a no-op (crash-replay idempotence)
    JdbcTableSink.applyChanges(batch, whUrl, "wh_orders", pks = Seq("ID"), opCol = "OP")
    assert(state() === after)
  }

  test("snapshot-then-changes works for STRING-keyed tables (VARCHAR staging)") {
    val whUrl = derbyUrl("derby_wh_str")
    val s = spark; import s.implicits._
    // snapshotOverwrite must stage strings as VARCHAR (not Derby CLOB),
    // otherwise the applyChanges PK equality predicate below fails
    val snapshot = Seq(("K1", 1.0), ("K2", 2.0), ("K3", 3.0)).toDF("SKU", "PRICE")
    JdbcTableSink.snapshotOverwrite(snapshot, whUrl, "wh_prices")
    val batch = Seq(("U", "K2", 22.0), ("D", "K3", 0.0)).toDF("OP", "SKU", "PRICE")
    JdbcTableSink.applyChanges(batch, whUrl, "wh_prices", pks = Seq("SKU"), opCol = "OP")
    val conn = DriverManager.getConnection(whUrl)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT sku, price FROM wh_prices ORDER BY sku")
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      while (rs.next()) rows += ((rs.getString(1), rs.getDouble(2)))
      assert(rows.toSeq === Seq(("K1", 1.0), ("K2", 22.0)))
    } finally conn.close()
  }
}
