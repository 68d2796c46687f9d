package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("histogram bins values with right-open-except-last edges") {
    val s = spark; import s.implicits._
    val df = Seq(0.0, 0.5, 1.0, 1.5, 9.99, 10.0, -0.1, 10.1).toDF("v")
    val h = Profile.histogram(df, "v", nBins = 5, lo = 0.0, hi = 10.0)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Double]("lo_edge"), r.getAs[Double]("hi_edge"), r.getAs[Long]("n_rows")))
      .toMap
    assert(h(0) === ((0.0, 2.0, 4L)))  // 0.0, 0.5, 1.0, 1.5
    assert(h(4)._3 === 2L)             // 9.99 and the exact-hi 10.0
    assert(h.values.map(_._3).sum === 6L) // -0.1 and 10.1 excluded
  }

  test("FP edge: a value strictly below hi whose division rounds to nBins stays in the last bin") {
    val s = spark; import s.implicits._
    // floor((0.8999999999999999 - 0) / ((0.9 - 0) / 5)) == 5 in IEEE doubles —
    // without the least-clamp this emits bin 5 with hi_edge > hi
    val df = Seq(0.8999999999999999).toDF("v")
    val h = Profile.histogram(df, "v", nBins = 5, lo = 0.0, hi = 0.9).collect()
    assert(h.length === 1)
    assert(h.head.getAs[Int]("bin") === 4)
    assert(h.head.getAs[Double]("hi_edge") <= 0.9 + 1e-12)
  }

  test("per-group histograms keep groups independent") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1.0), ("a", 1.2), ("b", 9.0)).toDF("g", "v")
    val h = Profile.histogram(df, "v", 10, 0.0, 10.0, groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(h(("a", 1)) === 2L && h(("b", 9)) === 1L && h.size === 2)
  }

  test("shareDrift: shares, zero-filled vanished/appeared categories, TVD sums to the hand value") {
    val s = spark; import s.implicits._
    val cur = Seq("a", "a", "a", "b").toDF("source")
    val ref = Seq("a", "b", "b", "c").toDF("source")
    val rows = graft.operators.Profile.shareDrift(cur, ref, "source")
      .collect()
      .map(r => r.getAs[String]("category") -> ((
        r.getAs[Long]("n_cur"), r.getAs[Long]("n_ref"),
        r.getAs[Double]("share_cur"), r.getAs[Double]("share_ref"),
        r.getAs[Double]("tv_contrib"))))
      .toMap
    assert(rows.keySet === Set("a", "b", "c"))
    assert(rows("a") === ((3L, 1L, 0.75, 0.25, 0.25)))
    assert(rows("b") === ((1L, 2L, 0.25, 0.5, 0.125)))
    assert(rows("c") === ((0L, 1L, 0.0, 0.25, 0.125))) // appeared → share 0 on cur side
    // total variation distance = Σ contributions
    assert(math.abs(rows.values.map(_._5).sum - 0.5) < 1e-12)
  }

  test("plan: one partial-combined aggregation, bin as a projection") {
    val plan = Profile.histogram(
        spark.range(1000).select((col("id") % 17).cast("double").as("v")),
        "v", 8, 0.0, 17.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), s"must combine map-side:\n$plan")
    assert(plan.split("Exchange").length - 1 === 1, s"one exchange only:\n$plan")
  }
}
