package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, Similarity}

/** One-off sizing probe: recall@3 of the exact-re-ranked IVF candidate set
  * as nProbe widens — the ceiling any PQ-shortlist+re-rank query can reach
  * at that probe width. */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 3)
      .select(col("vec_id"), col("neighbor_id")).cache()
    val n = exact.count()
    val nCells = math.max(16, (emb.count() / 125L).toInt)
    for (nProbe <- Seq(4, 6, 8, 10, 12)) {
      implicit val cs: CacheScope = new CacheScope
      try {
        val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
            k = 3, nCells = nCells, nProbe = nProbe)
          .select(col("vec_id"), col("neighbor_id"))
        val hit = approx.intersect(exact).count()
        println(f"[sweep] nCells=$nCells nProbe=$nProbe recall@3=${hit.toDouble / n}%.4f")
      } finally cs.release()
    }

    // ---- persisted-index serving family (q60/q79/q86): batch-vs-corpus
    // split recall as the probe widens, float tier vs int8-shortlist+
    // exact-refine tier ----
    import graft.operators.{IvfIndex, TableStore}
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions._
    val corpus = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val qn = batch.select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("q_v"))
      .withColumn("q_nrm", l2Norm(col("q_v"))).filter(col("q_nrm") > 0)
    val cn = corpus.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v"))).filter(col("nrm") > 0)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("id").asc)
    val splitExact = qn.crossJoin(cn)
      .withColumn("cosine", dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id")).cache()
    val nSplit = splitExact.count()
    val root = java.nio.file.Files.createTempDirectory("graft_sweep_idx").toString
    val store = new TableStore(root)
    val idxCells = math.max(8, (corpus.count() / 56L).toInt)
    locally {
      implicit val cs: CacheScope = new CacheScope
      try IvfIndex.build(corpus, "vec_id", "embedding", idxCells, 1, store, "emb_idx")
      finally cs.release()
    }
    IvfIndex.quantizeStored(spark, store, "emb_idx")
    for (nProbe <- Seq(2, 3, 4, 5, 6, 8, 10, 12)) {
      val fl = IvfIndex.topK(spark, batch, "vec_id", "embedding",
          store, "emb_idx", k = 3, nProbe)
        .select(col("vec_id"), col("neighbor_id"))
      val rf = IvfIndex.topKRefined(spark, batch, "vec_id", "embedding",
          store, "emb_idx", k = 3, nProbe, shortlist = 32)
        .select(col("vec_id"), col("neighbor_id"))
      // candidate CEILING at this probe width: exact re-rank of EVERY
      // candidate (shortlist far beyond the cell population) — the recall
      // any shortlist/compression tier at this nProbe can at most reach
      val ceil = IvfIndex.topKRefined(spark, batch, "vec_id", "embedding",
          store, "emb_idx", k = 3, nProbe, shortlist = 1 << 20)
        .select(col("vec_id"), col("neighbor_id"))
      val hitF = fl.intersect(splitExact).count()
      val hitR = rf.intersect(splitExact).count()
      val hitC = ceil.intersect(splitExact).count()
      println(f"[sweep-idx] nCells=$idxCells nProbe=$nProbe " +
        f"float=${hitF.toDouble / nSplit}%.4f refined32=${hitR.toDouble / nSplit}%.4f " +
        f"ceiling=${hitC.toDouble / nSplit}%.4f")
    }

    // ---- PQ-persisted serving tier (q87): recall of the 16-byte-code
    // ADC shortlist + exact refine as (nProbe, shortlist) widen — the
    // sweep that either finds the cheapest ≥0.9 config or shows the
    // codes' ceiling (r10 verdict item 8). The ceiling column above
    // bounds every shortlist at the same nProbe. ----
    import graft.operators.PqIndex
    PqIndex.buildStored(spark, store, "emb_idx", m = 16, nCodes = 32,
      iterations = 2)
    for (nProbe <- Seq(4, 5, 6, 8); shortlist <- Seq(64, 128, 256)) {
      val pq = PqIndex.topKRefined(spark, batch, "vec_id", "embedding",
          store, "emb_idx", k = 3, nProbe, shortlist)
        .select(col("vec_id"), col("neighbor_id"))
      val hit = pq.intersect(splitExact).count()
      println(f"[sweep-pq] nProbe=$nProbe shortlist=$shortlist " +
        f"recall@3=${hit.toDouble / nSplit}%.4f")
    }

    // ---- STREAMED-admission family (q110): the model fits on the 80%
    // seed only, the % 10 == 9 slice folds in refit-free, so its recall
    // curve is NOT q60's (worse-fitting cells for the admitted tenth).
    // This sweep finds the cheapest ≥0.9 serving point for the admitted
    // index — the q99/q109 discipline applied to the streamed family. ----
    val seed = emb.filter(!pmod(col("vec_id"), lit(10)).isin(0, 9))
    val streamed = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
    val sroot = java.nio.file.Files.createTempDirectory("graft_sweep_sidx").toString
    val sstore = new TableStore(sroot)
    val sCells = math.max(8, (seed.count() / 56L).toInt)
    locally {
      implicit val cs: CacheScope = new CacheScope
      try IvfIndex.build(seed, "vec_id", "embedding", sCells, 1, sstore, "emb_idx")
      finally cs.release()
    }
    // batch admission ≡ the streamed drain (set-canonical fold)
    IvfIndex.admitBatch(spark, streamed, 0L, "vec_id", "embedding", sstore, "emb_idx")
    for (nProbe <- Seq(2, 3, 4, 5, 6, 8, 10)) {
      val fl = IvfIndex.topK(spark, batch, "vec_id", "embedding",
          sstore, "emb_idx", k = 3, nProbe)
        .select(col("vec_id"), col("neighbor_id"))
      val hit = fl.intersect(splitExact).count()
      println(f"[sweep-stream] nCells=$sCells nProbe=$nProbe " +
        f"float=${hit.toDouble / nSplit}%.4f")
    }
    spark.stop()
  }
}
