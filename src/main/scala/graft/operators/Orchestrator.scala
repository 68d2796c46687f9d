package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.meta.MetaStore
import graft.plans.SyncPlanner
import graft.plans.SyncPlanner.WorkItem
import graft.sources.StageListing

/** The task-DAG + worker-loop control plane
  * (control_migration_schema_script.sql:163–203, 494–552), Spark-idiomatic:
  * the 5 fixed Snowflake worker tasks + queue-sharding become N driver
  * `Future`s draining one concurrent queue, each submitting independent
  * Spark jobs (Spark's own scheduler parallelizes within each job; FAIR
  * pools would arbitrate across tables on a shared cluster).
  *
  * Dequeue-delete (sql:185) → `ConcurrentLinkedQueue.poll()` — the same
  * per-table at-most-once-per-cycle guarantee without a DELETE round-trip.
  * Dispatch mirrors sql:190–198: 'F' full, 'I' incremental, 'B' full THEN
  * incremental on top (sequencing preserved).
  */
object Orchestrator {

  final case class SyncFailure(item: WorkItem, error: Throwable)

  final case class SyncReport(
      items: Seq[(WorkItem, Long)],
      failures: Seq[SyncFailure] = Nil)

  /** The reference's cycle-abort (sql:155): raised after all drainers have
    * finished when any table failed, carrying the full report — completed
    * tables keep their advanced watermarks (each table's swap+watermark is
    * already atomic), failed tables retry next cycle. */
  final class SyncCycleAbort(val report: SyncReport)
      extends RuntimeException(
        s"sync cycle aborted: ${report.failures.size} table(s) failed: " +
          report.failures
            .map(f => s"${f.item.fullPath} [${f.item.loadType}]: ${f.error}")
            .mkString("; "))

  /** One sync cycle: liveness gate → plan → drain with `workers` concurrent
    * drainers → abort with per-table errors if anything failed.
    *
    * Failure semantics vs the reference: SHOW TASKS + abort-if-suspended
    * (sql:73–91) maps to the pre-plan SparkContext liveness gate (our
    * workers are Futures submitting to the context — a stopped context is
    * the analog of a suspended task fleet). The per-worker `throw`
    * (sql:155) maps to [[SyncCycleAbort]]: every failed table is surfaced
    * (not just the first, and never silently — a drainer that hits an
    * error records it and keeps draining, so one broken table can't take
    * down the other workers' throughput for the cycle). */
  def runCycle(
      spark: SparkSession,
      stages: Map[String, String],
      metaStore: MetaStore,
      store: TableStore,
      schemas: Map[String, StructType],
      workers: Int = 5,
      abortOnFailure: Boolean = true): SyncReport = {
    if (spark.sparkContext.isStopped)
      throw new IllegalStateException(
        "worker backend is down (SparkContext stopped) — aborting the sync " +
          "cycle before planning (sql:73–91, 155)")
    val metas = metaStore.loadAll()
    val listing = StageListing.listAll(spark, stages)
    val items = SyncPlanner.plan(listing, SyncPlanner.metaDf(spark, metas))

    val queue = new ConcurrentLinkedQueue[WorkItem]()
    items.foreach(queue.add)
    val results = new ConcurrentLinkedQueue[(WorkItem, Long)]()
    val failures = new ConcurrentLinkedQueue[SyncFailure]()

    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, workers))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val drainers = (1 to workers).map { i =>
      Future {
        // one FAIR pool per drainer so concurrent table loads share the
        // cluster fairly when spark.scheduler.mode=FAIR is configured
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"graft-worker-$i")
        var item = queue.poll()
        while (item != null) { // LOOP … IF null BREAK (sql:176–189)
          try {
            val meta = metaStore.get(item.fullPath)
              .getOrElse(throw new IllegalStateException(s"no metadata for ${item.fullPath}"))
            val stageDir = stages(meta.stage)
            val rows = item.loadType match {
              case "F" => FullLoad.run(spark, meta, stageDir, store, metaStore, schemas(meta.fullPath))
              case "I" => IncrementalMerge.run(spark, meta, stageDir, store, metaStore)
              case "B" => // full load first, then replay changes on top (sql:190–193)
                val full = FullLoad.run(spark, meta, stageDir, store, metaStore, schemas(meta.fullPath))
                val inc = IncrementalMerge.run(spark, metaStore.get(item.fullPath).get,
                  stageDir, store, metaStore)
                full + math.max(0L, inc) // -1 = empty incremental batch, not an error
              case other => throw new IllegalArgumentException(s"unknown load type $other")
            }
            results.add(item -> rows)
          } catch {
            case scala.util.control.NonFatal(e) => failures.add(SyncFailure(item, e))
          }
          item = queue.poll()
        }
      }
    }
    try Await.result(Future.sequence(drainers), Duration.Inf)
    finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    val report = SyncReport(
      results.asScala.toSeq.sortBy(_._1.fullPath),
      failures.asScala.toSeq.sortBy(_.item.fullPath))
    if (abortOnFailure && report.failures.nonEmpty) throw new SyncCycleAbort(report)
    report
  }
}
