package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected declared queries so
  * pushdown / broadcast / codegen spans can be audited (SURVEY §4). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_join_residual", "q13_cdc_merge",
      "q15_jaccard_pairs", "q29_ivf_topk", "q39_decontaminate",
      "q41_pack_sequences", "q46_training_prep", "q56_ivf_trained",
      "q60_ivf_persisted", "q61_semdedup_cells")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
