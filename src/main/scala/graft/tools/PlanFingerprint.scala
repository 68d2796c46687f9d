package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Normalized physical-plan fingerprint per declared query — the shape
  * regression net. The q26 round-3 regression (an accidental extra
  * window+shuffle on the merge path) was found by a human reading bench
  * numbers; a committed fingerprint catches the same class of change in
  * CI: a plan that GAINS a shuffle Exchange, a SinglePartition exchange, a
  * CartesianProduct, or a broadcast-nested-loop join fails
  * [[graft.PlanRegressionSpec]] before any benchmark runs.
  *
  * Counts come from the pre-execution physical plan's tree text (with AQE
  * this is the initial plan — deterministic, no data-dependent replanning),
  * so fingerprinting never runs the query's jobs beyond what the query
  * function itself materializes while composing.
  */
object PlanFingerprint {

  /** The counted plan features. The first four only ever regress by
    * INCREASING; the two join strategies are recorded as context (a
    * broadcast→sort-merge flip shows up as smj +1 AND an exchange gain). */
  final case class Fp(
      exchanges: Int,
      singlePartition: Int,
      cartesian: Int,
      bcastNestedLoop: Int,
      sortMergeJoin: Int,
      broadcastHashJoin: Int) {
    def tsv: String =
      s"$exchanges\t$singlePartition\t$cartesian\t$bcastNestedLoop\t$sortMergeJoin\t$broadcastHashJoin"
  }

  object Fp {
    val header = "exchanges\tsingle_partition\tcartesian\tbcast_nested_loop\tsort_merge_join\tbroadcast_hash_join"
    def fromTsv(cols: Seq[String]): Fp =
      Fp(cols(0).toInt, cols(1).toInt, cols(2).toInt, cols(3).toInt, cols(4).toInt, cols(5).toInt)
  }

  def of(df: DataFrame): Fp = {
    val plan = df.queryExecution.executedPlan.toString
    def count(token: String): Int = {
      var n = 0
      var i = plan.indexOf(token)
      while (i >= 0) { n += 1; i = plan.indexOf(token, i + token.length) }
      n
    }
    // "Exchange <partitioning>" is the shuffle node; BroadcastExchange is a
    // different operator (cheap, counted via the joins that demand it)
    val shuffles = count("Exchange hashpartitioning") +
      count("Exchange rangepartitioning") +
      count("Exchange SinglePartition") +
      count("Exchange RoundRobinPartitioning")
    Fp(
      exchanges = shuffles,
      singlePartition = count("Exchange SinglePartition"),
      cartesian = count("CartesianProduct"),
      bcastNestedLoop = count("BroadcastNestedLoopJoin"),
      sortMergeJoin = count("SortMergeJoin"),
      broadcastHashJoin = count("BroadcastHashJoin"))
  }

  /** Fingerprint every declared query at `dir`. Queries are composed (and
    * any internal fixture jobs run) but the returned frame is never
    * executed. */
  def all(spark: SparkSession, dir: String): Map[String, Fp] =
    graft.SparkEntry.queries.map { case (name, fn) => name -> of(fn(spark, dir)) }

  val snapshotPath = "PLAN_SNAPSHOT.tsv"

  def writeSnapshot(fps: Map[String, Fp], path: String = snapshotPath): Unit = {
    val body = s"# query\t${Fp.header}\n" +
      fps.toSeq.sortBy(_._1).map { case (n, f) => s"$n\t${f.tsv}" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def readSnapshot(path: String = snapshotPath): Map[String, Fp] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val cols = l.split("\t").toSeq
        cols.head -> Fp.fromTsv(cols.tail)
      }.toMap
  }
}

/** Regenerate the committed plan snapshot (run after an INTENDED plan
  * change; the diff shows exactly which queries moved):
  * `sbt 'runMain graft.tools.PlanSnapshot'` */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // MUST match the spec's session (TestSpark): plan shapes depend on
    // shuffle partitions and broadcast thresholds
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fps = PlanFingerprint.all(spark, dir)
    PlanFingerprint.writeSnapshot(fps)
    println(s"[plansnapshot] wrote ${fps.size} fingerprints to ${PlanFingerprint.snapshotPath}")
    spark.stop()
  }
}
