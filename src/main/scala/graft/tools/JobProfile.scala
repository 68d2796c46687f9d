package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one declared query with a job listener that prints every
  * Spark job's wall time and call site — where a multi-job drain's fixed
  * overhead actually goes. `runMain graft.tools.JobProfile <query> [sfDir]`. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm pass (seed caches, JIT) — untracked
    graft.SparkEntry.queries(name)(spark, dir).collect()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (j.time,
          Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(j.jobId, (j.time, "?"))
        done.add((j.jobId, j.time - t0, site))
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b)
          .getOrElse(-1L)
        val run = Option(i.taskMetrics).map(_.executorRunTime).getOrElse(-1L)
        stages.add((i.stageId, dur, i.numTasks,
          f"run=${run}ms ${i.name.takeWhile(_ != '\n').take(50)}"))
      }
    })
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()
    val execDone = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            // first plan lines + any scan Location lines, so a bare
            // "Scan parquet" exec names WHICH table it read
            val lines = s.physicalPlanDescription.linesIterator
              .filterNot(_.trim.isEmpty).toSeq
            val plan = (lines.take(4) ++
              lines.filter(l => l.contains("Location:") || l.contains("file:"))
                .take(3).map(_.trim.take(160)))
              .mkString(" | ").take(640)
            execs.put(s.executionId, (s.time,
              s.description.takeWhile(_ != '\n').take(50) + " :: " + plan))
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            Option(execs.get(s.executionId)).foreach { case (t0, d) =>
              execDone.add((s.executionId, s.time - t0, d))
            }
          case _ => ()
        }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
    val wall = (System.nanoTime() - t0) / 1e9
    locally {
      import scala.jdk.CollectionConverters._
      Thread.sleep(500)
      val ex = execDone.asScala.toSeq.sortBy(_._1)
      println(f"[jobprofile] ${ex.size} sql execs, ${ex.map(_._2).sum / 1e3}%.2f s summed")
      ex.foreach { case (id, ms, d) =>
        println(f"[jobprofile]   exec $id%4d ${ms / 1e3}%7.3f s  $d")
      }
    }
    Thread.sleep(1000) // drain listener bus
    import scala.jdk.CollectionConverters._
    val jobs = done.asScala.toSeq.sortBy(_._1)
    println(f"[jobprofile] $name: $wall%.2f s wall, ${jobs.size} jobs, " +
      f"${jobs.map(_._2).sum / 1e3}%.2f s summed ($n rows)")
    val jobMinMs = sys.env.getOrElse("JOBPROFILE_MIN_MS", "200").toLong
    jobs.filter(_._2 > jobMinMs).foreach { case (id, ms, site) =>
      println(f"[jobprofile]   job $id%3d ${ms / 1e3}%7.3f s  $site")
    }
    val st = stages.asScala.toSeq.sortBy(_._1)
    println(f"[jobprofile] ${st.size} stages, ${st.map(_._2).sum / 1e3}%.2f s summed; " +
      f"task-count histo: ${st.groupBy(_._3).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")
    st.filter(_._2 > 150).foreach { case (id, ms, n, nm) =>
      println(f"[jobprofile]   stage $id%4d ${ms / 1e3}%7.3f s $n%3d tasks  $nm")
    }
    spark.stop()
  }
}
