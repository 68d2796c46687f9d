package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener
import graft.meta.{MetaStore, TableMeta}
import graft.operators.{FullLoad, IncrementalMerge, TableStore}

/** The lazy widen probe's short-circuit, verified on EXECUTION EVIDENCE
  * rather than code reading (r5 ADVICE follow-through): with
  * `widen_on_drift` enabled and NO drift in the batch, the merge must read
  * the change files once — the full-width probe (the "second full scan"
  * the optimistic design exists to avoid) must never execute. With drift
  * it must execute, then the merge retries and succeeds.
  *
  * Detection: a QueryExecutionListener records every query execution's
  * analyzed plan. The probe's plan is unmistakable — it selects the
  * lookahead column `_c{width + widenWindow}` (`_c13` for this 4-column
  * fixture: width 5 = op + 4 data, window 8), which no merge scan ever
  * reads (merge scans stop at `_c5`, and even the post-widen retry stops
  * at `_c6`). */
class WidenProbeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", DecimalType(10, 0)),
    StructField("name", StringType),
    StructField("balance", DecimalType(12, 2)),
    StructField("updated_at", TimestampType)))

  /** `_c13` = op + 4 data columns + widenWindow(8), 0-based lookahead. */
  private val probeColumn = "_c13"

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  private def setup(): (String, MetaStore, TableStore, TableMeta) = {
    val root = tmpDir("widenprobe")
    val stageDir = s"$root/stage"
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "LOAD00000001.csv", Seq(
      "1,alice,100.50,2026-01-01 00:00:00",
      "2,bob,200.00,2026-01-01 00:00:00"))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    val meta = TableMeta(
      fullPath = s"$tableDir", dbTable = "customer_sync", dbSchema = "cdc",
      stage = "s1", primaryKeys = "id",
      additionalConfig = """{"widen_on_drift": true}""")
    metaStore.upsert(meta)
    (stageDir, metaStore, store, meta)
  }

  /** Collects every execution's analyzed plan, success or failure (the
    * drift guard makes the first merge attempt FAIL mid-action, and that
    * failed execution still scanned the files). */
  private class PlanLog extends QueryExecutionListener {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      plans.add(qe.analyzed.toString)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      plans.add(qe.analyzed.toString)
  }

  /** The listener bus is async — give it a bounded moment to drain. */
  private def drained[A](log: PlanLog)(check: Seq[String] => A): A = {
    Thread.sleep(200)
    val deadline = System.currentTimeMillis() + 10000
    var last: Seq[String] = Nil
    var stable = 0
    while (System.currentTimeMillis() < deadline && stable < 3) {
      import scala.jdk.CollectionConverters._
      val now = log.plans.asScala.toSeq
      if (now.size == last.size) stable += 1 else stable = 0
      last = now
      Thread.sleep(100)
    }
    check(last)
  }

  test("no drift: the merge never executes the full-width probe scan") {
    val (stageDir, metaStore, store, meta) = setup()
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00",
      "I,3,carol,300.00,2026-01-02 00:00:00"))
    val log = new PlanLog
    spark.listenerManager.register(log)
    try {
      val rows = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
        stageDir, store, metaStore)
      assert(rows === 2)
      drained(log) { plans =>
        assert(plans.nonEmpty, "listener recorded nothing — detection is broken")
        val probeRuns = plans.filter(_.contains(probeColumn))
        assert(probeRuns.isEmpty,
          s"widen probe executed on a drift-free merge (${probeRuns.size} plan(s) " +
            s"read $probeColumn) — the optimistic short-circuit regressed")
      }
    } finally spark.listenerManager.unregister(log)
    // merge actually applied
    assert(store.read(spark, "cdc_customer_sync").count() === 3)
  }

  test("drift: the probe executes once and the retried merge widens + succeeds") {
    val (stageDir, metaStore, store, meta) = setup()
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00,extra1",
      "I,3,carol,300.00,2026-01-02 00:00:00,extra3"))
    val log = new PlanLog
    spark.listenerManager.register(log)
    try {
      val rows = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
        stageDir, store, metaStore)
      assert(rows === 2)
      drained(log) { plans =>
        val probeRuns = plans.filter(_.contains(probeColumn))
        assert(probeRuns.nonEmpty, "drift batch must trigger the widen probe")
      }
    } finally spark.listenerManager.unregister(log)
    val widened = store.read(spark, "cdc_customer_sync")
    assert(widened.columns.contains("c5"), "target must carry the widened column")
    assert(widened.count() === 3)
  }
}
