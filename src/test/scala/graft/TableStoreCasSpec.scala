package graft

import org.apache.spark.sql.Row
import graft.operators.{BucketSpec, TableStore, VersionConflictException}

/** Optimistic concurrency on the TableStore manifest: a writer whose read
  * snapshot went stale must FAIL its commit, never last-writer-wins — the
  * "batch Orchestrator + streaming CdcStream pointed at the same table"
  * config accident (the reference gets the same safety by serializing
  * through dequeue-delete, sql:185). */
class TableStoreCasSpec extends SparkSpec {
  import spark.implicits._

  private def oneRow(tag: String) = Seq((1, tag)).toDF("id", "payload")

  test("interleaved writers: one wins, the loser throws, table readable throughout") {
    val store = new TableStore(tmpDir("cas"))
    store.write(oneRow("v1"), "t")
    assert(store.currentVersion("t") === Some(1))

    // Writer A resolves its snapshot and fully prepares its next version…
    val aExpected = store.currentVersion("t")
    val aStaging = store.newStaging("t")
    oneRow("from-A").write.parquet(aStaging.toString)

    // …writer B lands a complete write in between…
    store.write(oneRow("from-B"), "t")
    assert(store.currentVersion("t") === Some(2))

    // …so A's commit must be refused, loudly.
    intercept[VersionConflictException] {
      store.commitStaged("t", aExpected, aStaging, None)
    }

    // The winner's commit is intact and the table never stopped being
    // readable; the loser's staging files are gone.
    assert(store.currentVersion("t") === Some(2))
    assert(store.read(spark, "t").collect().toSeq === Seq(Row(1, "from-B")))
    assert(!java.nio.file.Files.exists(aStaging))
  }

  test("create race: second creator of the same table conflicts") {
    val store = new TableStore(tmpDir("cas-create"))
    val staging = store.newStaging("t") // first creator's snapshot: no table
    oneRow("slow-creator").write.parquet(staging.toString)
    store.write(oneRow("fast-creator"), "t") // second creator lands first
    intercept[VersionConflictException] {
      store.commitStaged("t", None, staging, None)
    }
    assert(store.read(spark, "t").collect().toSeq === Seq(Row(1, "fast-creator")))
  }

  test("stale snapshot on a bucketed merge commit is refused") {
    val store = new TableStore(tmpDir("cas-bucketed"))
    val spec = BucketSpec(4, Seq("id"))
    store.writeBucketed((1 to 20).map(i => (i, s"orig-$i")).toDF("id", "payload"), "t", spec)
    val stale = store.currentVersion("t")
    val staging = store.newStaging("t")
    import org.apache.spark.sql.functions.col
    store.readRaw(spark, "t").filter(col("_bucket") === 0)
      .write.partitionBy("_bucket").parquet(staging.toString)
    store.writeBucketed((1 to 20).map(i => (i, s"next-$i")).toDF("id", "payload"), "t", spec)
    intercept[VersionConflictException] {
      store.commitStaged("t", stale, staging, Some(spec))
    }
    assert(store.read(spark, "t").collect().map(_.getString(1)).forall(_.startsWith("next-")))
  }

  test("truly concurrent writers: every commit either succeeds or conflicts; no torn table") {
    val store = new TableStore(tmpDir("cas-threads"))
    store.write(oneRow("seed"), "t")
    val nWriters = 4
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, String]]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to nWriters).map { i =>
      val th = new Thread(() => {
        start.await()
        try { store.write(oneRow(s"writer-$i"), "t"); results.add(Right(s"writer-$i")) }
        catch { case _: VersionConflictException => results.add(Left(s"writer-$i")) }
      })
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val (conflicts, wins) = results.asScala.toSeq.partition(_.isLeft)
    assert(wins.size + conflicts.size === nWriters)
    assert(wins.nonEmpty) // at least one writer must make progress
    // version advanced once per successful commit, and the live contents
    // are exactly one winner's rows — never a mix
    assert(store.currentVersion("t") === Some(1 + wins.size))
    val payloads = store.read(spark, "t").collect().map(_.getString(1)).toSeq
    assert(payloads.size === 1)
    assert(wins.map(_.toOption.get).contains(payloads.head))
  }
}
