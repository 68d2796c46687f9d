package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.meta.{MetaStore, TableMeta}
import graft.operators.{FullLoad, IncrementalMerge, Orchestrator, TableStore}
import graft.plans.MetadataBootstrap

/** End-to-end CDC pipeline over synthesized DMS-style stage fixtures
  * (FIXTURES.md §B): full load, incremental I/U/D merge, watermark replay
  * skip, empty-batch early exit, 'B' both-path, metadata bootstrap.
  */
class CdcPipelineSpec extends SparkSpec {

  // cdc.customer_sync fixture (FIXTURES.md): NUMBER(p,s) + TEXT + timestamp
  private val schema = StructType(Seq(
    StructField("id", DecimalType(10, 0)),
    StructField("name", StringType),
    StructField("balance", DecimalType(12, 2)),
    StructField("updated_at", TimestampType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  private def setup(): (String, String, MetaStore, TableStore, TableMeta) = {
    val root = tmpDir("cdc")
    val stageDir = s"$root/stage"
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "LOAD00000001.csv", Seq(
      "1,alice,100.50,2026-01-01 00:00:00",
      "2,bob,200.00,2026-01-01 00:00:00",
      "3,carol,300.25,2026-01-01 00:00:00"))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    val meta = TableMeta(
      fullPath = s"$tableDir", dbTable = "customer_sync", dbSchema = "cdc",
      stage = "s1", primaryKeys = "id") // single PK
    metaStore.upsert(meta)
    (root, stageDir, metaStore, store, meta)
  }

  private def snapshot(store: TableStore): Map[String, (String, String)] =
    store.read(spark, "cdc_customer_sync").collect()
      .map(r => r.getDecimal(0).toPlainString -> (r.getString(1), r.getDecimal(2).toPlainString))
      .toMap

  test("full load then incremental I/U/D merge, latest file wins") {
    val (_, stageDir, metaStore, store, meta) = setup()
    val n = FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    assert(n === 3)
    assert(metaStore.get(meta.fullPath).get.lastIncrementalFile === "0")

    val tableDir = s"$stageDir/cdc/customer_sync"
    // batch 1: update alice, delete bob, insert dave
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00",
      "D,2,bob,200.00,2026-01-02 00:00:00",
      "I,4,dave,400.00,2026-01-02 00:00:00"))
    // batch 2 (same merge cycle, later file): alice updated again, dave deleted
    writeCsv(tableDir, "20260103-000000001.csv", Seq(
      "U,1,alice3,112.00,2026-01-03 00:00:00",
      "D,4,dave,400.00,2026-01-03 00:00:00"))

    val rows = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    assert(rows === 3) // 3 distinct PKs touched (1, 2, 4)
    val snap = snapshot(store)
    assert(snap === Map(
      "1" -> ("alice3", "112.00"),
      "3" -> ("carol", "300.25")))
    assert(metaStore.get(meta.fullPath).get.lastIncrementalFile === "20260103-000000001.csv")
  }

  test("a change file wider than the target schema fails loudly, naming the file") {
    val (_, stageDir, metaStore, store, meta) = setup()
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    val tableDir = s"$stageDir/cdc/customer_sync"
    // upstream added a column mid-stream: rows now carry op + 5 data cells
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00,extra-col"))
    val err = intercept[Exception] {
      IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    }
    val msg = Option(err.getMessage).getOrElse("") +
      Option(err.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("schema drift"), s"unexpected error: $err")
    assert(msg.contains("20260102-000000001.csv"), "error should name the offending file")
    // the target is untouched — drift never half-applies
    assert(snapshot(store) === Map(
      "1" -> ("alice", "100.50"),
      "2" -> ("bob", "200.00"),
      "3" -> ("carol", "300.25")))
  }

  test("widen_on_drift: a column-add merges with a metadata-only widen (bucketed)") {
    val root = tmpDir("cdcwiden")
    val stageDir = s"$root/stage"
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "LOAD00000001.csv", Seq(
      "1,alice,100.50,2026-01-01 00:00:00",
      "2,bob,200.00,2026-01-01 00:00:00",
      "3,carol,300.25,2026-01-01 00:00:00"))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    val meta = TableMeta(
      fullPath = tableDir, dbTable = "customer_sync", dbSchema = "cdc",
      stage = "s1", primaryKeys = "id",
      additionalConfig = """{"buckets": 4, "widen_on_drift": true}""")
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)

    // upstream added a "tier" column: change rows now carry op + 5 cells
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00,gold",
      "I,4,dave,400.00,2026-01-02 00:00:00,silver"))
    val rows = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
      stageDir, store, metaStore)
    assert(rows === 2)

    val out = store.read(spark, "cdc_customer_sync")
    assert(out.schema.fieldNames.toSeq ===
      Seq("id", "name", "balance", "updated_at", "c5"))
    val byId = out.collect()
      .map(r => r.getDecimal(0).toPlainString -> Option(r.getString(4))).toMap
    // merged rows carry the new column; pre-widen rows (incl. rows living
    // in untouched, hard-linked buckets) read as null
    assert(byId === Map("1" -> Some("gold"), "2" -> None, "3" -> None,
      "4" -> Some("silver")))
    // the widen itself was metadata-only: one extra version, then the merge
    assert(store.declaredSchema("cdc_customer_sync").isDefined)

    // a SECOND batch at the widened width merges with no further widening
    writeCsv(tableDir, "20260103-000000001.csv", Seq(
      "U,2,bob2,201.00,2026-01-03 00:00:00,bronze"))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
      stageDir, store, metaStore)
    val byId2 = store.read(spark, "cdc_customer_sync").collect()
      .map(r => r.getDecimal(0).toPlainString -> Option(r.getString(4))).toMap
    assert(byId2("2") === Some("bronze") && byId2("1") === Some("gold"))
  }

  test("widen_on_drift: an unbucketed target widens and merges the same way") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    val meta = meta0.copy(additionalConfig = """{"widen_on_drift": true}""")
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    val tableDir = s"$stageDir/cdc/customer_sync"
    // two new trailing columns at once
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00,gold,eu"))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
      stageDir, store, metaStore)
    val out = store.read(spark, "cdc_customer_sync")
    assert(out.schema.fieldNames.toSeq ===
      Seq("id", "name", "balance", "updated_at", "c5", "c6"))
    val row1 = out.filter(col("id") === 1).collect().head
    assert((row1.getString(4), row1.getString(5)) === (("gold", "eu")))
    assert(out.filter(col("id") === 3).collect().head.isNullAt(4))
  }

  test("widen_on_drift: exactly widenWindow (8) new columns still widens") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    val meta = meta0.copy(additionalConfig = """{"widen_on_drift": true}""")
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    val tableDir = s"$stageDir/cdc/customer_sync"
    // the documented per-batch limit is k <= 8 — the boundary must widen,
    // not trip the over-window failure (lookahead column distinguishes)
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00," + (1 to 8).map("x" + _).mkString(",")))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
      stageDir, store, metaStore)
    val out = store.read(spark, "cdc_customer_sync")
    assert(out.schema.fieldNames.toSeq ===
      Seq("id", "name", "balance", "updated_at") ++ (5 to 12).map("c" + _))
    val row1 = out.filter(col("id") === 1).collect().head
    assert(row1.getString(4) === "x1" && row1.getString(11) === "x8")
  }

  test("widen_on_drift: drift beyond the widen window still fails loudly") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    val meta = meta0.copy(additionalConfig = """{"widen_on_drift": true}""")
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    val tableDir = s"$stageDir/cdc/customer_sync"
    // 9 extra columns — one past the 8-column widen window
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00," + (1 to 9).map("x" + _).mkString(",")))
    val err = intercept[Exception] {
      IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
        stageDir, store, metaStore)
    }
    assert(Option(err.getMessage).getOrElse("").contains("re-baseline"))
    // target untouched
    assert(snapshot(store) === Map(
      "1" -> ("alice", "100.50"),
      "2" -> ("bob", "200.00"),
      "3" -> ("carol", "300.25")))
  }

  test("declared_columns: a matching (or add-carrying) declaration merges normally") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    // declared == stored, and declared with trailing ADDS — both pass the
    // policing (adds belong to the in-band widen path)
    val meta = meta0.copy(additionalConfig =
      """{"declared_columns": "id, name, balance, updated_at, new_col"}""")
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00"))
    val rows = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
      stageDir, store, metaStore)
    assert(rows === 1)
    assert(snapshot(store)("1") === ("alice2", "111.00"))
  }

  test("declared_columns: an upstream DROP is rejected loudly with the re-baseline remedy") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    FullLoad.run(spark, meta0, stageDir, store, metaStore, schema)
    // upstream dropped the middle column `balance`: every later positional
    // cell shifts left — merging would mis-cast, so the merge must refuse
    val meta = meta0.copy(additionalConfig =
      """{"declared_columns": "id, name, updated_at"}""")
    metaStore.upsert(meta)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,2026-01-02 00:00:00"))
    val err = intercept[IllegalStateException] {
      IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
        stageDir, store, metaStore)
    }
    assert(err.getMessage.contains("balance"), s"must name the dropped column: $err")
    assert(err.getMessage.contains("full load"), "must name the remediation")
    // target untouched, watermark NOT advanced — the batch replays after
    // the operator re-baselines
    assert(snapshot(store) === Map(
      "1" -> ("alice", "100.50"),
      "2" -> ("bob", "200.00"),
      "3" -> ("carol", "300.25")))
    assert(metaStore.get(meta.fullPath).get.lastIncrementalFile === "0")
  }

  test("declared_columns: an upstream RENAME is rejected loudly naming both sides") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    FullLoad.run(spark, meta0, stageDir, store, metaStore, schema)
    val meta = meta0.copy(additionalConfig =
      """{"declared_columns": "id, customer_name, balance, updated_at"}""")
    metaStore.upsert(meta)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00"))
    val err = intercept[IllegalStateException] {
      IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
        stageDir, store, metaStore)
    }
    assert(err.getMessage.contains("'name' -> 'customer_name'"),
      s"must name the rename pair: $err")
    assert(err.getMessage.contains("full load"), "must name the remediation")
    assert(snapshot(store)("1") === ("alice", "100.50"))
  }

  test("renames map: a declared upstream rename merges normally (no file rewrite)") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    FullLoad.run(spark, meta0, stageDir, store, metaStore, schema)
    // upstream renamed name → customer_name; declared_columns records the
    // new name and the renames map sanctions the bridge — the merge
    // proceeds on the stored layout (a rename moves no positional cell)
    val meta = meta0.copy(additionalConfig =
      """{"declared_columns": "id, customer_name, balance, updated_at",
        | "renames": {"name": "customer_name"}}""".stripMargin)
    metaStore.upsert(meta)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00"))
    val rows = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
      stageDir, store, metaStore)
    assert(rows === 1)
    assert(snapshot(store)("1") === ("alice2", "111.00"))
  }

  test("renames map: unmapped drift beside a mapped rename still fails loudly") {
    val (_, stageDir, metaStore, store, meta0) = setup()
    FullLoad.run(spark, meta0, stageDir, store, metaStore, schema)
    // the map covers name→customer_name, but declared ALSO renames
    // balance → amount: the unmapped half must still trip the guard
    val meta = meta0.copy(additionalConfig =
      """{"declared_columns": "id, customer_name, amount, updated_at",
        | "renames": {"name": "customer_name"}}""".stripMargin)
    metaStore.upsert(meta)
    writeCsv(s"$stageDir/cdc/customer_sync", "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00"))
    val err = intercept[IllegalStateException] {
      IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get,
        stageDir, store, metaStore)
    }
    assert(err.getMessage.contains("'balance' -> 'amount'"),
      s"the unmapped rename must surface: $err")
    assert(snapshot(store)("1") === ("alice", "100.50"))
  }

  test("renames map: stale entries and colliding mappings fail actionably") {
    import graft.operators.SchemaEvolution
    val stored = Seq("id", "name", "balance", "updated_at")
    val stale = intercept[IllegalStateException] {
      SchemaEvolution.check("t", stored, stored, Map("ghost" -> "other"))
    }
    assert(stale.getMessage.contains("ghost") && stale.getMessage.contains("stale"))
    val collide = intercept[IllegalStateException] {
      SchemaEvolution.check("t",
        Seq("id", "x", "x", "updated_at"), stored,
        Map("name" -> "x", "balance" -> "x"))
    }
    assert(collide.getMessage.contains("collides"))
    // and an empty map is the plain path: same acceptance as before
    SchemaEvolution.check("t", stored, stored, Map.empty)
  }

  test("SchemaEvolution.classify covers the positional-feed evolution shapes") {
    import graft.operators.SchemaEvolution._
    val stored = Seq("id", "name", "balance", "updated_at")
    assert(classify(stored, stored) === Compatible)
    assert(classify(stored :+ "extra", stored) === Compatible) // trailing add
    // target AHEAD of the metadata (in-band widen landed before
    // declared_columns was refreshed): the extras carry the widen path's
    // auto-generated c<N> names — must pass, not false-positive as a drop
    assert(classify(stored, stored :+ "c5") === Compatible)
    assert(classify(stored, stored ++ Seq("c5", "c6")) === Compatible)
    // but a REAL named trailing column missing from a refreshed
    // declaration is a genuine upstream drop: merging would null-overwrite
    // the stored values on every update — must reject loudly
    assert(classify(stored.dropRight(1), stored) ===
      Drops(Seq("updated_at")))
    // a MID-table drop is the positionally corrupting case and rejects
    assert(classify(Seq("id", "name", "updated_at"), stored) ===
      Drops(Seq("balance")))
    assert(classify(Seq("id", "customer_name", "balance", "updated_at"), stored) ===
      Renames(Seq("name" -> "customer_name")))
    // rename + trailing add still classifies as the rename
    assert(classify(Seq("id", "customer_name", "balance", "updated_at", "x"), stored) ===
      Renames(Seq("name" -> "customer_name")))
    assert(classify(Seq("id", "balance", "name", "updated_at"), stored) ===
      Reordered)
    // a swap that drops a column too is beyond the recognizable shapes
    assert(classify(Seq("balance", "id"), stored) === Incompatible)
  }

  test("replayed files at-or-below the watermark are skipped (empty batch early-exits)") {
    val (_, stageDir, metaStore, store, meta) = setup()
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "20260102-000000001.csv", Seq("U,1,alice2,111.00,2026-01-02 00:00:00"))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    val v1 = snapshot(store)
    // second cycle with no new files: early exit, nothing changes
    val r2 = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    assert(r2 === -1L)
    assert(snapshot(store) === v1)
  }

  test("orchestrated cycle: plan decides F then I; 'B' after a new full load + new changes") {
    val (_, stageDir, metaStore, store, meta) = setup()
    val stages = Map("s1" -> stageDir)
    val schemas = Map(meta.fullPath -> schema)

    // cycle 1: only the full-load file exists → F
    val rep1 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 2)
    assert(rep1.items.map(_._1.loadType) === Seq("F"))
    assert(snapshot(store).keySet === Set("1", "2", "3"))

    // cycle 2: a change file arrives → I
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "20260102-000000001.csv", Seq("U,1,alice2,150.00,2026-01-02 00:00:00"))
    val rep2 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 2)
    assert(rep2.items.map(_._1.loadType) === Seq("I"))
    assert(snapshot(store)("1") === ("alice2", "150.00"))

    // cycle 3: nothing new → empty plan
    val rep3 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 2)
    assert(rep3.items.isEmpty)

    // cycle 4: NEW full load (newer mtime) + new change file → B: reload then replay.
    // DMS re-exports replace the folder's full-load chunk files, so drop the
    // stale chunk first (all remaining LOAD* files together form ONE snapshot).
    Files.delete(Paths.get(tableDir, "LOAD00000001.csv"))
    Thread.sleep(1100) // ensure a strictly newer mtime (fs granularity)
    writeCsv(tableDir, "LOAD00000002.csv", Seq(
      "1,alice,100.50,2026-01-01 00:00:00",
      "2,bob,200.00,2026-01-01 00:00:00"))
    writeCsv(tableDir, "20260104-000000001.csv", Seq("U,2,bob2,222.00,2026-01-04 00:00:00"))
    val rep4 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 2)
    assert(rep4.items.map(_._1.loadType) === Seq("B"))
    val snap = snapshot(store)
    // full load replaced the table (carol gone), then ALL change files
    // replayed on top (watermark reset to "0"): alice2 from the old change
    // file, bob2 from the new one.
    assert(snap === Map("1" -> ("alice2", "150.00"), "2" -> ("bob2", "222.00")))
  }

  test("stray non-DMS files in the table dir never become phantom work items") {
    val (_, stageDir, metaStore, store, meta) = setup()
    val stages = Map("s1" -> stageDir)
    val schemas = Map(meta.fullPath -> schema)
    Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 1)
    // files the strict change regex must ignore: a marker file and a name
    // starting with '2' that sorts ABOVE every real change-file name — the
    // classic permanent-phantom poison (planner says 'I', merge finds
    // nothing, watermark never advances, forever)
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "_SUCCESS", Seq(""))
    writeCsv(tableDir, "2backup.csv", Seq("U,1,evil,0.00,2026-01-02 00:00:00"))
    val rep = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 1)
    assert(rep.items.isEmpty, s"stray files produced phantom work: ${rep.items}")
    // and a REAL change file alongside the strays still syncs normally
    writeCsv(tableDir, "20260102-000000001.csv", Seq("U,1,alice2,111.00,2026-01-02 00:00:00"))
    val rep2 = Orchestrator.runCycle(spark, stages, metaStore, store, schemas, workers = 1)
    assert(rep2.items.map(_._1.loadType) === Seq("I"))
    assert(snapshot(store)("1") === ("alice2", "111.00"))
    assert(metaStore.get(meta.fullPath).get.lastIncrementalFile === "20260102-000000001.csv")
  }

  test("crash between table write and watermark advance replays idempotently") {
    val (_, stageDir, metaStore, store, meta) = setup()
    FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
    val tableDir = s"$stageDir/cdc/customer_sync"
    writeCsv(tableDir, "20260102-000000001.csv", Seq(
      "U,1,alice2,111.00,2026-01-02 00:00:00",
      "D,2,bob,200.00,2026-01-02 00:00:00"))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    val afterFirst = snapshot(store)
    // simulate a crash AFTER the new table version was swapped in but
    // BEFORE the watermark advanced: roll the watermark back and replay
    metaStore.advanceIncremental(meta.fullPath, "0")
    val replayed = IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    assert(replayed >= 0) // batch re-applied, not skipped
    assert(snapshot(store) === afterFirst) // …but the state is unchanged
    assert(metaStore.get(meta.fullPath).get.lastIncrementalFile === "20260102-000000001.csv")
  }

  test("metadata bootstrap discovers (schema, table, prefix) from the stage listing") {
    val (_, stageDir, _, _, _) = setup()
    val metas = MetadataBootstrap.bootstrap(spark, "s1", stageDir, Map("customer_sync" -> "id"))
    assert(metas.size === 1)
    val m = metas.head
    assert(m.dbSchema === "cdc")
    assert(m.dbTable === "customer_sync")
    assert(m.primaryKeys === "id")
    assert(m.fullPath.endsWith("cdc/customer_sync"))
    assert(m.lastIncrementalFile === "0")
  }

  test("quoted CSV fields with embedded commas and quotes round-trip") {
    val root = tmpDir("cdcq")
    val stageDir = s"$root/stage"
    val tableDir = s"$stageDir/cdc/quoted"
    val qSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("note", StringType)))
    writeCsv(tableDir, "LOAD00000001.csv", Seq(
      """1,"hello, world"""",
      """2,"she said ""hi""""""))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    val meta = TableMeta(fullPath = tableDir, dbTable = "quoted", dbSchema = "cdc",
      stage = "s1", primaryKeys = "id")
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, qSchema)
    writeCsv(tableDir, "20260102-000000001.csv", Seq("""U,1,"now, with ""more"", commas""""))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    val snap = store.read(spark, "cdc_quoted").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(snap === Map(1 -> """now, with "more", commas""", 2 -> """she said "hi""""))
  }

  test("composite primary keys with spaces in the metadata string (sql:298)") {
    val root = tmpDir("cdc2")
    val stageDir = s"$root/stage"
    val tableDir = s"$stageDir/cdc/pairs"
    val pairSchema = StructType(Seq(
      StructField("k1", IntegerType), StructField("k2", StringType),
      StructField("v", StringType)))
    writeCsv(tableDir, "LOAD00000001.csv", Seq("1,a,x", "1,b,y", "2,a,z"))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    val meta = TableMeta(fullPath = tableDir, dbTable = "pairs", dbSchema = "cdc",
      stage = "s1", primaryKeys = "k1, k2") // note the space
    metaStore.upsert(meta)
    FullLoad.run(spark, meta, stageDir, store, metaStore, pairSchema)
    writeCsv(tableDir, "20260102-000000001.csv", Seq("U,1,a,x2", "D,2,a,z"))
    IncrementalMerge.run(spark, metaStore.get(meta.fullPath).get, stageDir, store, metaStore)
    val snap = store.read(spark, "cdc_pairs").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getString(2)).toMap
    assert(snap === Map((1, "a") -> "x2", (1, "b") -> "y"))
  }
}
