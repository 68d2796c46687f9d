package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {

  private def vecs() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "a", Array(1.0f, 0.0f, 2.0f)),
      (2L, "a", Array(3.0f, 4.0f, 0.0f)),
      (3L, "b", Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
  }

  test("groupCentroids averages each dimension per group in long form") {
    val c = Embeddings.groupCentroids(vecs(), "label", "embedding")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(c(("a", 0)) === ((2.0, 2L)))
    assert(c(("a", 1)) === ((2.0, 2L)))
    assert(c(("a", 2)) === ((1.0, 2L)))
    assert(c(("b", 0)) === ((0.0, 1L)))
    assert(c.size === 6)
  }

  test("normStats reports per-group L2 norm profile") {
    val m = Embeddings.normStats(vecs(), "label", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n, avgN, minN, maxN) = m("a")
    assert(n === 2L)
    assert(math.abs(minN - math.sqrt(5.0)) < 1e-12)
    assert(maxN === 5.0)
    assert(math.abs(avgN - (math.sqrt(5.0) + 5.0) / 2) < 1e-12)
    assert(m("b") === ((1L, 0.0, 0.0, 0.0)))
  }

  test("centroid aggregation partial-combines; no vector survives the exchange") {
    val plan = Embeddings.groupCentroids(
        spark.range(1000).select(col("id"), lit("g").as("label"),
          array(lit(1.0f), lit(2.0f)).as("embedding")),
        "label", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_avg") || plan.contains("partial_"),
      s"centroid must combine map-side:\n$plan")
  }
}
