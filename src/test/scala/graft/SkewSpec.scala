package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Deterministic skew mitigation: salted operators must be result-identical
  * to their plain equivalents (salts derive from hashes, never rand). */
class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals the plain aggregation") {
    val s = spark; import s.implicits._
    // one pathologically hot key + several cold ones
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"cold-${i % 5}", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedAgg(df, keys = Seq("k"), sums = Seq("v"), saltBuckets = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (n, sv)) =>
      assert(n === plain(k)._1, s"count mismatch for $k")
      // double sums reassociate across salt buckets — same freedom the
      // unsalted partial aggregation already has
      assert(math.abs(sv - plain(k)._2) < 1e-6, s"sum mismatch for $k")
    }
    // determinism: a second run produces the identical result
    val again = Skew.saltedAgg(df, keys = Seq("k"), sums = Seq("v"), saltBuckets = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(again === salted)
  }

  test("salted join equals the plain inner join row-for-row") {
    val s = spark; import s.implicits._
    val probe = ((1 to 5000).map(i => (1, s"hot-$i")) ++ // hot key 1
      (1 to 100).map(i => (i % 10 + 2, s"cold-$i"))).toDF("k", "p")
    val build = (1 to 12).map(i => (i, s"dim-$i")).toDF("k", "d")
    val plain = probe.join(build, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(probe, build, keys = Seq("k"), salt = 8)
      .select("k", "p", "d")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    assert(salted === plain)
    assert(salted.length === 5000 + 100) // every probe row matched exactly once
  }
}
