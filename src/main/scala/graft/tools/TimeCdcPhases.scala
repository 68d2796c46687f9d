package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, round, sum}

/** Dev tool: phase-level timing of the q26 CDC pipeline — replays the exact
  * q26 body with a stopwatch around each operator so a bench regression can
  * be attributed (full load vs merge vs compact probe vs final aggregate)
  * instead of guessed at. `runMain graft.tools.TimeCdcPhases [sfDir] [passes]`. */
object TimeCdcPhases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stageDir = graft.SparkEntry.prepareCdcStage(spark, dir)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"    $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    for (p <- 1 to passes) {
      println(s"pass $p:")
      val total0 = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory("graft_phases").toString
      val metaStore = new graft.meta.MetaStore(s"$root/meta")
      val store = new graft.operators.TableStore(s"$root/warehouse")
      val meta = graft.meta.TableMeta(fullPath = s"$stageDir/sales/orders_sync",
        dbTable = "orders_sync", dbSchema = "sales", stage = "s1",
        primaryKeys = "o_orderkey", additionalConfig = """{"buckets": 16}""")
      metaStore.upsert(meta)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
      timed("full_load") {
        graft.operators.FullLoad.run(spark, meta, stageDir, store, metaStore, schema)
      }
      // Replay IncrementalMerge.run step-by-step (same ops, with a stopwatch
      // per phase) to attribute the merge's cost.
      locally {
        val m = metaStore.get(meta.fullPath).get
        val tableDir2 = s"$stageDir/${m.dbSchema}/${m.dbTable}"
        val changeRe = graft.sources.DmsFileClassifier.changeFileRegex
        val pending = timed("  list+filter stage") {
          graft.sources.StageListing.listFiles(spark, tableDir2)
            .filter(f => f.file.matches(changeRe))
            .filter(f => f.file.substring(f.file.lastIndexOf('/') + 1) > m.lastIncrementalFile)
        }
        val target = store.read(spark, m.targetTableName)
        val changes = graft.sources.CsvStageReader.read(
          spark, pending.map(_.file), target.schema, withOp = true,
          exactRowNumbers = false) // mirror IncrementalMerge.run exactly
        val batch = timed("  latestPerKey+cache") {
          val b = graft.operators.ChangeApplier.latestPerKey(changes, m.pkColumns).cache()
          b.count(); b
        }
        val spec = store.bucketSpec(m.targetTableName).get
        val batchBuckets = batch.withColumn("_bucket", spec.bucketColumn)
        val bucketCounts = timed("  bucket counts collect") {
          batchBuckets.groupBy("_bucket").agg(count(lit(1)).as("n"))
            .collect().map(r => r.getInt(0) -> r.getLong(1))
        }
        val touched = bucketCounts.map(_._1).toSet
        val merged = {
          val prunedTarget = store.readRaw(spark, m.targetTableName)
            .filter(col("_bucket").isin(touched.toSeq.map(Integer.valueOf): _*))
            .drop("_bucket")
          graft.operators.ChangeApplier.applyLatest(prunedTarget, batch, m.pkColumns)
            .withColumn("_bucket", spec.bucketColumn)
        }
        timed("  commitBucketMerge") {
          store.commitBucketMerge(merged, m.targetTableName, touched, 1)
        }
        timed("  compact probe") {
          store.compact(spark, m.targetTableName, 32)
        }
        batch.unpersist()
        timed("  advance watermark") {
          metaStore.advanceIncremental(m.fullPath,
            pending.map(f => f.file.substring(f.file.lastIndexOf('/') + 1)).max)
        }
      }
      val n = timed("final aggregate") {
        store.read(spark, "sales_orders_sync")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("o_orderstatus")).collect().length
      }
      println(f"    TOTAL ($n rows)             ${(System.nanoTime() - total0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
