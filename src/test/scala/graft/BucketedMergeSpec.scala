package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.meta.{MetaStore, TableMeta}
import graft.operators.{BucketSpec, FullLoad, IncrementalMerge, TableStore}

/** Copy-on-write bucketed layout: same results as the plain path, and an
  * incremental merge rewrites ONLY the buckets its batch touches — every
  * other bucket's files carry into the next version as links. */
class BucketedMergeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("payload", StringType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  private def runPipeline(root: String, config: String): Map[Int, String] = {
    val stageDir = s"$root/stage"
    val dir = s"$stageDir/app/t"
    writeCsv(dir, "LOAD00000001.csv", (1 to 100).map(i => s"$i,orig-$i"))
    writeCsv(dir, "20260105-000000001.csv", Seq("U,1,one-upd", "D,2,x"))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    metaStore.upsert(TableMeta(fullPath = dir, dbTable = "t", dbSchema = "app",
      stage = "s1", primaryKeys = "id", additionalConfig = config))
    assert(FullLoad.run(spark, metaStore.get(dir).get, stageDir, store, metaStore, schema) === 100L)
    IncrementalMerge.run(spark, metaStore.get(dir).get, stageDir, store, metaStore)
    store.read(spark, "app_t").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
  }

  test("bucketCount parses from additional_config; absent/malformed is None") {
    def meta(cfg: String) = TableMeta(fullPath = "p", dbTable = "t", dbSchema = "s",
      stage = "st", additionalConfig = cfg)
    assert(meta("""{"buckets": 8}""").bucketCount === Some(8))
    assert(meta("""{"buckets": "16", "other": true}""").bucketCount === Some(16))
    assert(meta("{}").bucketCount === None)
    assert(meta("""{"buckets": "many"}""").bucketCount === None)
    assert(meta("""{"buckets": 8}""").configValue("other") === None)
  }

  test("bucketed pipeline equals the plain path; merge rewrites only touched buckets") {
    val plain = runPipeline(tmpDir("plain"), "{}")
    assert(plain.size === 99) // 100 − 1 delete
    assert(plain(1) === "one-upd")

    // bucketed pipeline, instrumented between load and merge
    val root = tmpDir("bucketed")
    val stageDir = s"$root/stage"
    val dir = s"$stageDir/app/t"
    writeCsv(dir, "LOAD00000001.csv", (1 to 100).map(i => s"$i,orig-$i"))
    val metaStore = new MetaStore(s"$root/meta")
    val store = new TableStore(s"$root/warehouse")
    metaStore.upsert(TableMeta(fullPath = dir, dbTable = "t", dbSchema = "app",
      stage = "s1", primaryKeys = "id", additionalConfig = """{"buckets": 8}"""))
    assert(FullLoad.run(spark, metaStore.get(dir).get, stageDir, store, metaStore, schema) === 100L)
    assert(store.bucketSpec("app_t") === Some(BucketSpec(8, Seq("id"))))

    def bucketFiles(): Map[String, Set[String]] = {
      val base = Paths.get(store.path("app_t"))
      val stream = Files.list(base)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("_bucket="))
          .map { p =>
            val s2 = Files.list(p)
            try p.getFileName.toString ->
              s2.iterator().asScala.map(_.getFileName.toString)
                .filter(_.startsWith("part-")).toSet
            finally s2.close()
          }.toMap
      } finally stream.close()
    }
    val before = bucketFiles()
    assert(before.keySet.size === 8) // 100 keys land in all 8 buckets

    // change batch touching exactly two keys
    writeCsv(dir, "20260105-000000001.csv", Seq("U,1,one-upd", "D,2,x"))
    IncrementalMerge.run(spark, metaStore.get(dir).get, stageDir, store, metaStore)

    // the touched buckets of keys 1 and 2, via the same hash
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val touched = Seq(1, 2).toDF("id")
      .select(BucketSpec(8, Seq("id")).bucketColumn.as("b"))
      .collect().map(_.getInt(0)).toSet

    val after = bucketFiles()
    before.keySet.foreach { bdir =>
      val b = bdir.stripPrefix("_bucket=").toInt
      if (touched(b)) assert(after(bdir) !== before(bdir), s"touched bucket $b not rewritten")
      else assert(after(bdir) === before(bdir), s"untouched bucket $b was rewritten")
    }

    // logical result identical to the plain path
    val bucketed = store.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(bucketed === plain)
    // the logical schema stays clean (no layout column)
    assert(store.read(spark, "app_t").columns.toSeq === Seq("id", "payload"))

    // a second merge chains versions correctly
    writeCsv(dir, "20260106-000000001.csv", Seq("U,3,three-upd"))
    IncrementalMerge.run(spark, metaStore.get(dir).get, stageDir, store, metaStore)
    val v3 = store.read(spark, "app_t").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(v3(3) === "three-upd")
    assert(v3.size === 99)
  }

  test("merge keyed on different pks than the bucket layout fails loudly, never un-buckets") {
    val s = spark; import s.implicits._
    val root = tmpDir("bucketdrift")
    val store = new TableStore(s"$root/warehouse")
    store.writeBucketed(
      Seq((1, "a"), (2, "b")).toDF("id", "payload"), "t", BucketSpec(4, Seq("id")))
    val batch = Seq(("U", 1, "a2")).toDF("op", "id", "payload")
      .withColumn("_file_name", org.apache.spark.sql.functions.lit("f"))
      .withColumn("_row_in_file", org.apache.spark.sql.functions.lit(1L))
    val err = intercept[IllegalStateException] {
      IncrementalMerge.applyBatch(spark, store, "t", batch, pks = Seq("payload"))
    }
    assert(err.getMessage.contains("bucketed on (id)"))
    // the layout survives: the table is still bucketed, data untouched
    assert(store.bucketSpec("t").isDefined)
    assert(store.read(spark, "t").count() === 2)
  }

  test("bucketed and plain pipelines agree on random multi-file change logs (seed=42)") {
    val rng = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      // random change files: ops over a small hot key space so files
      // genuinely collide on keys (I/U/D orders matter across files)
      val files = (1 to 3).map { f =>
        val rows = (1 to 10 + rng.nextInt(20)).map { _ =>
          val op = Seq("I", "U", "D")(rng.nextInt(3))
          s"$op,${1 + rng.nextInt(40)},${op.toLowerCase}-${rng.nextInt(1000)}"
        }
        f"2026010$f-${trial}%09d.csv" -> rows
      }
      val results = Seq("{}", """{"buckets": 4}""").map { cfg =>
        val root = tmpDir(s"prop$trial")
        val stageDir = s"$root/stage"
        val dir = s"$stageDir/app/t"
        writeCsv(dir, "LOAD00000001.csv", (1 to 30).map(i => s"$i,orig-$i"))
        files.foreach { case (name, rows) => writeCsv(dir, name, rows) }
        val metaStore = new MetaStore(s"$root/meta")
        val store = new TableStore(s"$root/warehouse")
        metaStore.upsert(TableMeta(fullPath = dir, dbTable = "t", dbSchema = "app",
          stage = "s1", primaryKeys = "id", additionalConfig = cfg))
        FullLoad.run(spark, metaStore.get(dir).get, stageDir, store, metaStore, schema)
        IncrementalMerge.run(spark, metaStore.get(dir).get, stageDir, store, metaStore)
        store.read(spark, "app_t").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      }
      assert(results(0) === results(1), s"trial $trial: plain vs bucketed diverged")
    }
  }

  test("parallel merge writes grow file counts; compact bounds them, preserving data") {
    val root = tmpDir("compact")
    val store = new TableStore(s"$root/warehouse")
    val s = spark; import s.implicits._
    val seed = (1 to 200).map(i => (i, s"orig-$i")).toDF("id", "payload")
    store.writeBucketed(seed, "app_t", BucketSpec(4, Seq("id")))
    assert(store.bucketFileCounts("app_t").values.max === 1)

    // merges with cluster-scale write parallelism (4 files/bucket),
    // auto-compaction disabled: buckets hold multiple part-files
    (1 to 3).foreach { i =>
      val batch = (1 to 50).map(k => ("U", k, s"upd$i-$k")).toDF("op", "id", "payload")
      IncrementalMerge.applyBatch(spark, store, "app_t", batch, Seq("id"),
        mergeFilesPerBucket = 4, compactAboveFiles = Int.MaxValue)
    }
    val grown = store.bucketFileCounts("app_t")
    assert(grown.values.max > 1, s"expected multi-file buckets, got $grown")
    val expected = store.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    // compaction rewrites oversized buckets to one file, new atomic version
    val vBefore = store.currentVersion("app_t").get
    assert(store.compact(spark, "app_t", maxFilesPerBucket = 1).contains(vBefore + 1))
    assert(store.bucketFileCounts("app_t").values.max === 1)
    val after = store.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(after === expected)

    // healthy table → no-op: no data read, no version created
    assert(store.compact(spark, "app_t", maxFilesPerBucket = 1) === None)
    assert(store.currentVersion("app_t").get === vBefore + 1)

    // the merge path's opportunistic compaction bounds counts by itself
    val batch = (1 to 50).map(k => ("U", k, s"last-$k")).toDF("op", "id", "payload")
    IncrementalMerge.applyBatch(spark, store, "app_t", batch, Seq("id"),
      mergeFilesPerBucket = 4, compactAboveFiles = 2)
    assert(store.bucketFileCounts("app_t").values.max <= 2)
    val last = store.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(last(1) === "last-1" && last.size === 200)
  }

  test("streaming micro-batches take the copy-on-write path on a bucketed target") {
    val root = tmpDir("bstream")
    val store = new TableStore(s"$root/warehouse")
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val seed = (1 to 100).map(i => (i, s"orig-$i")).toDF("id", "payload")
    store.writeBucketed(seed, "app_t", BucketSpec(8, Seq("id")))

    val streamDir = s"$root/stage"
    Files.createDirectories(Paths.get(streamDir))
    writeCsv(streamDir, "20260105-000000001.csv", Seq("U,1,one-upd", "D,2,x"))
    val q = graft.streaming.CdcStream.start(spark, streamDir, "app_t", schema,
      Seq("id"), store, s"$root/chk", availableNow = true)
    q.awaitTermination(60000)

    val after = store.read(spark, "app_t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(after.size === 99)
    assert(after(1) === "one-upd")
    assert(!after.contains(2))
    // still bucketed (spec survived the streaming merge commit)
    assert(store.bucketSpec("app_t") === Some(BucketSpec(8, Seq("id"))))
    assert(store.read(spark, "app_t").columns.toSeq === Seq("id", "payload"))
  }
}
