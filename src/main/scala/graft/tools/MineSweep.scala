package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, Similarity}

/** One-off sizing probe for the hard-negative mining family: recall@5 of
  * the ANN-shortlist miner against the exact miner as (nProbe, shortlist)
  * widen — the sweep behind the declared ≥0.9 tier (the q99/q109/q123
  * discipline: declare the CHEAPEST operating point that clears 0.9). */
object MineSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.hardNegatives(
        emb, "vec_id", "embedding", "label",
        emb.filter(pmod(col("vec_id"), lit(23)) === 0),
        "vec_id", "embedding", "label", k = 5)
      .select(col("vec_id"), col("neighbor_id")).cache()
    val n = exact.count()
    val nCells = math.max(16, (emb.count() / 125L).toInt)
    println(s"[minesweep] nCells=$nCells exactPairs=$n")
    for ((nProbe, shortlist) <- Seq((10, 50), (12, 50), (13, 50), (13, 75),
        (14, 50), (16, 75))) {
      implicit val cs: CacheScope = new CacheScope
      try {
        val short = Similarity.ivfTopKAgainst(emb, "vec_id", "embedding",
          probes = emb.filter(col("vec_id") % 23 === 0),
          k = shortlist, nCells = nCells, nProbe = nProbe)
        val approx = Similarity.hardNegativesFromShortlist(short,
            emb.select(col("vec_id"), col("label")), "vec_id", "label", k = 5)
          .select(col("vec_id"), col("neighbor_id"))
        val hit = approx.intersect(exact).count()
        println(f"[minesweep] nProbe=$nProbe%-3d shortlist=$shortlist%-4d " +
          f"recall@5=${hit.toDouble / n}%.4f")
      } finally cs.release()
    }
    spark.stop()
  }
}
