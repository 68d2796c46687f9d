package graft

import java.sql.DriverManager
import graft.sources.JdbcTableSource

/** Partitioned JDBC ingest against an embedded Derby database (the only
  * JDBC engine available offline — it ships with Spark for the metastore).
  */
class JdbcTableSourceSpec extends SparkSpec {

  private def withDerby[T](f: String => T): T = {
    val dir = tmpDir("derby")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE src_orders (id BIGINT PRIMARY KEY, status VARCHAR(4), amount DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO src_orders VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, if (i % 2 == 0) "O" else "F")
        ins.setDouble(3, i * 1.5); ins.addBatch()
      }
      ins.executeBatch()
      f(url)
    } finally conn.close()
  }

  test("partitioned read covers all rows exactly once across range partitions") {
    withDerby { url =>
      val df = JdbcTableSource.readPartitioned(spark, url, "src_orders", "id", numPartitions = 4)
      assert(df.rdd.getNumPartitions === 4)
      assert(df.count() === 100)
      assert(df.select("id").distinct().count() === 100)
      val total = df.agg(org.apache.spark.sql.functions.sum("amount")).head.getDouble(0)
      assert(math.abs(total - (1 to 100).map(_ * 1.5).sum) < 1e-9)
    }
  }

  test("watermark pull fetches only rows above the last-seen key") {
    withDerby { url =>
      val inc = JdbcTableSource.readNewerThan(spark, url, "src_orders", "id", lastSeen = 90L)
      assert(inc.count() === 10)
      assert(inc.agg(org.apache.spark.sql.functions.min("id")).head.getLong(0) === 91L)
    }
  }
}
