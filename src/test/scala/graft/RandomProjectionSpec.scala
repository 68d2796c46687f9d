package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class RandomProjectionSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int) = {
    val s = spark; import s.implicits._
    // deterministic pseudo-random unit-scale vectors
    (1 to n).map { id =>
      (id.toLong, (0 until dim).map(i =>
        math.sin(id * 31 + i * 7).toFloat).toArray)
    }.toDF("id", "v")
  }

  test("projection matches the md5 weight derivation exactly") {
    val s = spark; import s.implicits._
    val df = vecs(3, 8).select(col("id"),
      randomProject(toDouble(col("v")), 4, "spec").as("p"))
    val got = df.orderBy("id").collect().map(_.getSeq[Double](1).toArray)
    // hand-build the same weights
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(j: Int, i: Int): Double = {
      val d = md.digest(s"spec:$j:$i".getBytes("UTF-8"))
      val hex = d.take(5).map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 100000L) / 50000.0 - 1.0
    }
    val scale = math.sqrt(3.0 / 4)
    val vsrc = (1 to 3).map(id => (0 until 8).map(i =>
      math.sin(id * 31 + i * 7).toFloat.toDouble).toArray)
    for (r <- 0 until 3; j <- 0 until 4) {
      val expect = (0 until 8).map(i => vsrc(r)(i) * w(j, i)).sum * scale
      assert(math.abs(got(r)(j) - expect) < 1e-12,
        s"row $r dim $j: got ${got(r)(j)}, expected $expect")
    }
  }

  test("JL contract: norms preserved in expectation, cosines roughly kept") {
    val df = vecs(200, 64)
      .select(col("id"), toDouble(col("v")).as("v"))
      .withColumn("p", randomProject(col("v"), 16, "jl"))
      .withColumn("ratio", l2Norm(col("p")) / l2Norm(col("v")))
    val mean = df.agg(avg(col("ratio"))).collect().head.getDouble(0)
    assert(mean > 0.85 && mean < 1.15,
      s"mean norm ratio should hover near 1, got $mean")
  }

  test("deterministic across layouts; seed re-keys the directions") {
    val base = vecs(50, 16).select(col("id"), toDouble(col("v")).as("v"))
    def fp(df: org.apache.spark.sql.DataFrame, seed: String) =
      df.select(col("id"), randomProject(col("v"), 8, seed).as("p"))
        .orderBy("id").collect().map(_.getSeq[Double](1)).toSeq
    assert(fp(base, "a") === fp(base.repartition(7), "a"))
    assert(fp(base, "a") !== fp(base, "b"))
  }

  test("projection stays in whole-stage codegen (no fallback)") {
    val s = spark; import s.implicits._
    // array<double> input straight in: a higher-order toDouble lambda
    // would itself be CodegenFallback and mask the expression under test.
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // projection at plan time; collect first so AQE finalizes the plan
    val dv = (1 to 10).map(id => (id.toLong,
      (0 until 16).map(i => math.sin(id * 31 + i * 7)).toArray)).toDF("id", "v")
    val df = dv.repartition(2).select(
      randomProject(col("v"), 4, "cg").as("p"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE renders whole-stage-codegen stages as the `*(n)` prefix
    assert(plan.contains("*(1) Project [randomprojection"),
      s"expected the projection inside a codegen stage:\n$plan")
  }
}
