package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Measured recall@k of every approximate-neighbour declared query against
  * the exact cosine baseline — the QUALITY regression net beside
  * PLAN_SNAPSHOT's shape net. Plan fingerprints catch a query that got
  * slower; they are blind to a query that got *worse*: a parameter-sizing
  * change (e.g. the r5→r6 re-parameterization of q29/q30 to corpus-derived
  * operating points) can silently trade recall for speed. The committed
  * snapshot makes that trade explicit, and [[graft.RecallRegressionSpec]]
  * fails when a change drops any tracked query's recall by more than the
  * tolerance.
  *
  * Ground truth: `bruteForceTopK` for the self-search family
  * (q29/q30/q56/q71); an exact cross scored join for the batch-vs-index
  * split family (q60/q79). Both orderings tie-break (cosine DESC, id ASC),
  * so recall is deterministic. */
object Recall {

  val snapshotPath = "RECALL_SNAPSHOT.tsv"

  /** k of the self/split search families (they emit top-3). */
  val k = 3

  /** Per-query k: the snapshot stores it per row so a parser never assumes
    * one metric across families (the mining rows are recall@5 — k=5 is
    * [[Similarity.hardNegatives]]' declared operating point there). */
  val kOf: Map[String, Int] = Map(
    "q116_hard_negatives_ann" -> 5,
    "q120_hard_negatives_quality" -> 5,
    "q136_hard_negatives_premium" -> 5).withDefaultValue(k)

  private def pairs(df: DataFrame): DataFrame =
    df.select(col("vec_id").cast("long").as("vec_id"),
      col("neighbor_id").cast("long").as("neighbor_id"))

  /** Exact top-k of `batch` vectors against a disjoint `corpus` — ground
    * truth for the persisted-index family. Quadratic on purpose; runs at
    * snapshot/spec scale only. */
  private def exactAgainst(batch: DataFrame, corpus: DataFrame): DataFrame = {
    val q = batch.select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("q_v"))
      .withColumn("q_nrm", l2Norm(col("q_v"))).filter(col("q_nrm") > 0)
    val c = corpus.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v"))).filter(col("nrm") > 0)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("id").asc)
    q.crossJoin(c)
      .withColumn("cosine", dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id"))
  }

  /** recall@k of every tracked ANN query at `dir` (the sf0.01 fixture is
    * the reference point — q30's tuned operating parameters are pinned
    * there). */
  def all(spark: SparkSession, dir: String): Map[String, Double] = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val selfExact = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", k)).cache()
    val splitExact = exactAgainst(
      emb.filter(pmod(col("vec_id"), lit(10)) === 0),
      emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)).cache()
    // hard-negative mining ground truth: the EXACT miner's (probe,
    // negative) pairs at q114/q116's declared operating point (k=5,
    // %23 probes) — the tracked quality is how much of the exact set the
    // ANN-shortlist path recovers, so this row is recall@5 not @3
    val mineExact = pairs(Similarity.hardNegatives(
      emb, "vec_id", "embedding", "label",
      emb.filter(pmod(col("vec_id"), lit(23)) === 0),
      "vec_id", "embedding", "label", k = 5)).cache()
    try {
      val tracked: Seq[(String, DataFrame)] = Seq(
        "q29_ivf_topk" -> selfExact,
        "q92_ivf_wide" -> selfExact,
        "q30_lsh_topk" -> selfExact,
        "q56_ivf_trained" -> selfExact,
        "q71_lsh_multiprobe" -> selfExact,
        "q84_pq_topk" -> selfExact,
        "q85_pq_refined" -> selfExact,
        "q60_ivf_persisted" -> splitExact,
        "q79_ivf_quantized" -> splitExact,
        "q86_ivf_refined" -> splitExact,
        "q99_ivf_quality" -> splitExact,
        "q87_pq_persisted" -> splitExact,
        "q109_pq_quality" -> splitExact,
        // streamed admission serves the SAME final corpus (80% seed +
        // 10% streamed = every vec_id % 10 != 0 row), so the split
        // ground truth applies verbatim
        "q110_stream_index" -> splitExact,
        // the streamed family's declared ≥0.9 point (q110's chain at
        // nProbe=6) — same ground truth as its budget tier
        "q123_stream_quality" -> splitExact,
        "q116_hard_negatives_ann" -> mineExact,
        // the quality tier: same exact ground truth, wider probe+overfetch
        "q120_hard_negatives_quality" -> mineExact,
        // the declared ≥0.9 tier (MineSweep's cheapest clearing point)
        "q136_hard_negatives_premium" -> mineExact)
      tracked.map { case (name, exact) =>
        val approx = pairs(graft.SparkEntry.queries(name)(spark, dir))
        val denom = exact.count()
        val hit = approx.intersect(exact).count()
        name -> (if (denom == 0) 0.0 else hit.toDouble / denom)
      }.toMap
    } finally {
      selfExact.unpersist()
      splitExact.unpersist()
      mineExact.unpersist()
    }
  }

  def writeSnapshot(recalls: Map[String, Double], path: String = snapshotPath): Unit = {
    val body = "# query\tk\trecall_at_k\n" +
      recalls.toSeq.sortBy(_._1)
        .map { case (n, r) => f"$n\t${kOf(n)}\t$r%.6f" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def readSnapshot(path: String = snapshotPath): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      // 3-col (query, k, recall_at_k); tolerate the legacy 2-col form
      .map { l => val cols = l.split("\t"); cols(0) -> cols.last.toDouble }
      .toMap
  }
}

/** Regenerate the committed recall snapshot (run after an INTENDED
  * quality-affecting change; the diff shows exactly which queries moved):
  * `sbt 'runMain graft.tools.RecallSnapshot'` */
object RecallSnapshot {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // MUST match the spec's session (TestSpark) so measured recall is the
    // recall the spec recomputes
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recalls = Recall.all(spark, dir)
    Recall.writeSnapshot(recalls)
    recalls.toSeq.sortBy(_._1).foreach { case (n, r) => println(f"[recall] $n%-22s $r%.4f") }
    println(s"[recall] wrote ${recalls.size} entries to ${Recall.snapshotPath}")
    spark.stop()
  }
}
