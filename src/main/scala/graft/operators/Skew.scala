package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the third leg of the shuffle toolkit next
  * to broadcast (small side) and AQE skew-join splitting (runtime): when a
  * handful of keys dominate (the Zipf reality of event types, languages,
  * boilerplate fingerprints), pre-scattering those keys bounds every task.
  *
  * Both operators are DETERMINISTIC (salts derive from row hashes, never
  * `rand()`), so results are bit-identical to their unsalted equivalents —
  * verifiable against a plain-SQL oracle, replay-safe in CDC pipelines.
  */
object Skew {

  /** Two-phase salted aggregation of re-aggregable measures (counts and
    * sums): phase 1 aggregates on (keys, salt) — the hot key's rows spread
    * over `saltBuckets` partial groups that combine map-side — phase 2
    * collapses the partials on the true keys.
    *
    * Equivalent to `df.groupBy(keys).agg(count(1), sum(c)…)` (double sums
    * reassociate, which is the same freedom the unsalted partial
    * aggregation already exercises). Use when a single group would
    * otherwise exceed one reducer: the second shuffle moves only
    * |keys| × saltBuckets rows.
    *
    * @param sums  data columns to sum
    * @return keys ++ (`n` row count) ++ (`sum_<col>` per summed column)
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    // deterministic per-row scatter: hash of the whole row — collisions
    // only co-locate identical rows, which is harmless for aggregation
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets))
    val partial = df
      .withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sums.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"),
        sums.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")): _*)
  }

  /** Skewed equi-join without broadcast: the probe (skewed, large) side
    * gets a deterministic salt in [0, salt); the build side is replicated
    * `salt` times; the join adds the salt to the key list. Each probe row
    * matches exactly the replica carrying its salt, so the result equals
    * the plain inner join row-for-row — but a hot key's rows now land in
    * `salt` different reducer partitions instead of one.
    *
    * Build-side cost is |build| × salt rows through the shuffle — use for
    * a MID-SIZED build side (too big to broadcast, small next to the probe
    * side), the exact gap AQE's skew splitting doesn't always cover (e.g.
    * when the skewed partition is one giant key that splitting can't
    * separate without a salt).
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val probeSalted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(salt)))
    val buildSalted = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    probeSalted.join(buildSalted, keys :+ "_salt").drop("_salt")
  }
}
