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
    spark.stop()
  }
}
