package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.meta.{MetaStore, TableMeta}
import graft.operators.{IncrementalMerge, Orchestrator, TableStore}
import graft.streaming.CdcStream

/** Concurrency + equivalence coverage: several tables loaded in one cycle
  * by concurrent workers (no watermark lost-updates), and the streaming
  * CDC path producing the same final table as the batch merge. */
class MultiTableOrchestrationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("payload", StringType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  test("three tables sync concurrently; every watermark survives the race") {
    val root = tmpDir("multi")
    val stageDir = s"$root/stage"
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    val tables = Seq("alpha", "beta", "gamma")
    tables.foreach { t =>
      val dir = s"$stageDir/app/$t"
      writeCsv(dir, "LOAD00000001.csv", (1 to 50).map(i => s"$i,$t-$i"))
      metaStore.upsert(TableMeta(fullPath = dir, dbTable = t, dbSchema = "app",
        stage = "s1", primaryKeys = "id"))
    }
    val stages = Map("s1" -> stageDir)
    val schemas = tables.map(t => s"$stageDir/app/$t" -> schema).toMap

    val rep1 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 3)
    assert(rep1.items.map(_._1.loadType) === Seq("F", "F", "F"))
    // full-load watermark reset recorded for every table (no lost update)
    tables.foreach { t =>
      val m = metaStore.get(s"$stageDir/app/$t").get
      assert(m.lastIncrementalFile === "0")
      assert(m.lastFullLoadDate.isDefined, s"lost full-load watermark for $t")
    }

    // change files for all three tables, merged concurrently
    tables.foreach { t =>
      writeCsv(s"$stageDir/app/$t", "20260105-000000001.csv",
        Seq(s"U,1,$t-updated", "D,2,x"))
    }
    val rep2 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 3)
    assert(rep2.items.map(_._1.loadType) === Seq("I", "I", "I"))
    tables.foreach { t =>
      val m = metaStore.get(s"$stageDir/app/$t").get
      assert(m.lastIncrementalFile === "20260105-000000001.csv",
        s"lost incremental watermark for $t")
      val snap = store.read(spark, s"app_$t").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(snap.size === 49) // 50 − 1 delete
      assert(snap(1) === s"$t-updated")
      assert(!snap.contains(2))
    }
  }

  test("a failing table aborts the cycle with its error surfaced; healthy tables still complete") {
    val root = tmpDir("abort")
    val stageDir = s"$root/stage"
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    Seq("good", "bad").foreach { t =>
      val dir = s"$stageDir/app/$t"
      writeCsv(dir, "LOAD00000001.csv", (1 to 10).map(i => s"$i,$t-$i"))
      metaStore.upsert(TableMeta(fullPath = dir, dbTable = t, dbSchema = "app",
        stage = "s1", primaryKeys = "id"))
    }
    // 'bad' has no schema registered -> its full load dies in the drainer
    val schemas = Map(s"$stageDir/app/good" -> schema)
    val e = intercept[Orchestrator.SyncCycleAbort] {
      Orchestrator.runCycle(spark, Map("s1" -> stageDir), metaStore, store, schemas, workers = 2)
    }
    // every failure surfaced with its table, not just the first exception
    assert(e.report.failures.map(_.item.fullPath) === Seq(s"$stageDir/app/bad"))
    assert(e.getMessage.contains("app/bad"))
    // the healthy table completed and kept its advanced watermark
    assert(e.report.items.map(_._1.fullPath) === Seq(s"$stageDir/app/good"))
    assert(metaStore.get(s"$stageDir/app/good").get.lastIncrementalFile === "0")
    assert(store.read(spark, "app_good").count() === 10)
    // the failed table retries next cycle (its watermark never advanced)
    assert(metaStore.get(s"$stageDir/app/bad").get.lastFullLoadDate.isEmpty)
  }

  test("streaming CDC produces the same table as the batch merge") {
    val root = tmpDir("equiv")
    val changes = Seq(
      "20260101-000000001.csv" -> Seq("I,10,a", "U,10,b", "I,20,c"),
      "20260102-000000001.csv" -> Seq("D,20,c", "U,10,d", "I,30,e"),
      "20260103-000000001.csv" -> Seq("U,30,f", "D,10,b"))
    val seed = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(Integer.valueOf(1), "seed")), schema)

    // batch path
    val batchStageDir = s"$root/batch/stage"
    val batchTableDir = s"$batchStageDir/app/t"
    changes.foreach { case (name, rows) => writeCsv(batchTableDir, name, rows) }
    val batchStore = new TableStore(s"$root/batch/warehouse")
    batchStore.write(seed, "app_t")
    val metaStore = new MetaStore(s"$root/batch/meta")
    metaStore.upsert(TableMeta(fullPath = batchTableDir, dbTable = "t", dbSchema = "app",
      stage = "s1", primaryKeys = "id"))
    IncrementalMerge.run(spark, metaStore.get(batchTableDir).get,
      batchStageDir, batchStore, metaStore)
    val batchResult = batchStore.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    // streaming path (same files, AvailableNow)
    val streamTableDir = s"$root/stream/stage/app/t"
    changes.foreach { case (name, rows) => writeCsv(streamTableDir, name, rows) }
    val streamStore = new TableStore(s"$root/stream/warehouse")
    streamStore.write(seed, "app_t")
    val q = CdcStream.start(spark, streamTableDir, "app_t", schema, Seq("id"),
      streamStore, s"$root/stream/chk", availableNow = true)
    q.awaitTermination(60000)
    val streamResult = streamStore.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    assert(batchResult === streamResult)
    assert(batchResult === Map(1 -> "seed", 30 -> "f"))
  }
}
