package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{CacheScope, Pq}

/** Dev probe: per-stage wall time of the IVF-PQ chain at a given probe
  * width — separates model build (cells + training + encoding) from ADC
  * scoring from the final cut. */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nProbe = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nCells = math.max(16, (emb.count() / 125L).toInt)
    implicit val cs: CacheScope = new CacheScope
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      // job-level accounting of the declared query
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (for {s <- si.submissionTime; e <- si.completionTime} yield (e - s) / 1e3)
            .getOrElse(-1.0)
          val m = si.taskMetrics
          println(f"[pqprofile]   stage ${si.stageId}%3d ${dur}%6.2f s  " +
            f"in=${m.inputMetrics.recordsRead}%9d shR=${m.shuffleReadMetrics.recordsRead}%9d " +
            f"shW=${m.shuffleWriteMetrics.recordsWritten}%9d  ${si.name.take(70)}")
        }
      }
      time("warmup q85")(graft.SparkEntry.queries("q85_pq_refined")(spark, dir).count())
      spark.sparkContext.addSparkListener(listener)
      time("full q85")(graft.SparkEntry.queries("q85_pq_refined")(spark, dir).count())
      spark.sparkContext.removeSparkListener(listener)
      time("full q84")(graft.SparkEntry.queries("q84_pq_topk")(spark, dir).count())
    } finally cs.release()
    spark.stop()
  }
}
