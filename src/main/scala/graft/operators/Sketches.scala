package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus profiling.
  *
  * KMV — k minimum values (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002; the estimator at the core of the theta
  * sketch family) — approximates a group's distinct count from only the k
  * smallest hash values of its members: if the k-th smallest of n uniform
  * hashes lands at fraction R of the hash space, n ≈ (k−1)/R. The sketch
  * is tiny (k longs), mergeable (union = k smallest of the concatenation,
  * exactly what a partial top-k aggregate computes map-side), and — built
  * on the repo's salted-md5 draw instead of a seeded random hash — fully
  * deterministic and SQL-replayable, unlike `approx_count_distinct`'s
  * HLL++, whose merge order is layout-dependent.
  *
  * Scale shape: ONE aggregate exchange, and a genuinely sub-distinct
  * one — raw rows feed a [[org.apache.spark.sql.graft.TopKPairs]]
  * deduplicating partial top-k directly (duplicate hashes are skipped
  * inside the size-k buffer), so at most k hashes per (group, partition)
  * ever reach the shuffle: O(groups · partitions · k) rows, independent
  * of both row count AND distinct count. No distinct pre-pass, no
  * windows, no sort, no driver state.
  */
object Sketches {

  /** Approximate distinct `valueCol` per group via a k-minimum-values
    * sketch over the salted 40-bit md5 draw.
    *
    * Output per group: `n_sketch` (hashes retained, = min(distinct, k))
    * and `est_distinct` — EXACT when the group holds fewer than k
    * distinct hashes (the sketch saw everything), the (k−1)/R estimator
    * otherwise. Both arms replay in SQL; the 0-hash guard (`greatest(hv,
    * 1)`) is mirrored there, so even the pathological all-zero draw is
    * deterministic.
    *
    * @param k sketch size (64 ⇒ ~13% typical relative error)
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val hv = conv(substring(md5(concat(lit(s"$salt:"),
      col(valueCol).cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    // one pass: raw rows straight into a DEDUPLICATING partial top-k —
    // repeated hashes are skipped inside the size-k buffer, so only the
    // k smallest distinct hashes per (group, partition) reach the single
    // aggregate exchange (score = −hash ⇒ highest-score-first keeps
    // ascending hashes). NULL values carry no identity and are excluded,
    // matching count(DISTINCT x) semantics.
    val sk = df
      .filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ hv.as("_hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs_distinct(-col("_hv").cast("double"), col("_hv"), k).as("tk"))
    val n = size(col("tk.neighbor_id"))
    val kth = element_at(col("tk.neighbor_id"), n) // largest retained = k-th smallest
    sk.select(groupCols.map(col) :+ n.as("n_sketch") :+
      round(
        when(n < k, n.cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1099511627776.0) / // 2^40
            greatest(kth, lit(1L)).cast("double")),
        4).as("est_distinct"): _*)
  }
}
