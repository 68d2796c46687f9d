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

  test("centroid classifier assigns held-out vectors to the nearest class mean") {
    val s = spark; import s.implicits._
    val train = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.1f)), (2L, 0, Array(0.9f, 0.1f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f, 0.1f)), (4L, 1, Array(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val test_ = Seq(
      (101L, Array(1.0f, 0.05f, 0.0f)), // x-direction → class 0
      (102L, Array(0.0f, 1.0f, 0.0f)), // y-direction → class 1
      (103L, Array(0.0f, 0.0f, 0.0f))) // zero-norm → dropped
      .toDF("vec_id", "embedding")
    val got = Embeddings.centroidClassifier(train, test_, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(101L -> 0, 102L -> 1))
  }

  test("centroid classifier breaks score ties by lowest class") {
    val s = spark; import s.implicits._
    // both classes have the SAME centroid direction → identical cosine
    val train = Seq(
      (1L, 5, Array(1.0f, 0.0f)), (2L, 3, Array(2.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val test_ = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Embeddings.centroidClassifier(train, test_, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(9L -> 3))
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
