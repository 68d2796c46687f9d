package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric profiling: fixed-width histograms over a column, optionally per
  * group — the corpus-health visual every curation pass starts from
  * (length distributions, score distributions, norm distributions).
  *
  * One hash aggregation with map-side partial combine: the bin id is a
  * pure projection (`floor((v − lo) / w)`), so the shuffle carries one row
  * per (group, bin, partition) no matter how large the input. Bin edges
  * travel in the output for direct plotting. Values outside `[lo, hi]` are
  * excluded (count them separately if they matter); `v = hi` lands in the
  * last bin, matching the usual right-open-except-last convention.
  *
  * Reference scope: the reference's profiling/summary queries
  * (control_migration_schema_script.sql:516–540) extended to distribution
  * shape, per SURVEY §2.
  */
object Profile {

  /** `(groupCols…, bin, lo_edge, hi_edge, n_rows)`, one row per non-empty
    * bin. `bin` is 0-based; empty bins are absent (left join a
    * `spark.range(nBins)` scaffold if a dense axis is needed). */
  def histogram(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      lo: Double,
      hi: Double,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val w = (hi - lo) / nBins
    val v = col(valueCol).cast("double")
    // least-clamp, not a v === hi special case: FP division can round
    // (v - lo) / w up to exactly nBins for a v strictly below hi, which
    // would emit an out-of-range bin with hi_edge > hi
    val bin = least(floor((v - lit(lo)) / lit(w)), lit(nBins - 1)).cast("int")
    val keys = groupCols.map(col) :+ bin.as("bin")
    df.filter(v >= lo && v <= hi)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_rows"))
      .select(groupCols.map(col) ++ Seq(col("bin"),
        (lit(lo) + col("bin") * lit(w)).as("lo_edge"),
        (lit(lo) + (col("bin") + 1) * lit(w)).as("hi_edge"),
        col("n_rows")): _*)
  }

  /** Mixture drift between two corpus snapshots — the check a pipeline
    * runs before retraining on a refreshed corpus ("did the source/
    * language/domain mix move?"): per category, the share of each
    * snapshot plus the total-variation contribution
    * `|share_cur − share_ref| / 2` (TVD is Σ of these — robust where KL
    * is undefined, i.e. exactly the interesting case of a category
    * appearing or vanishing). Categories absent from one side surface
    * with share 0 — appearance/disappearance IS drift, never dropped.
    *
    * Scale: each snapshot collapses to ≤ |categories| count rows before
    * anything joins (two partial-combined aggregations); totals are
    * broadcast 1-row aggregates; the category join is over tiny share
    * tables. Output: `(category, n_cur, n_ref, share_cur, share_ref,
    * tv_contrib)`. */
  def shareDrift(cur: DataFrame, ref: DataFrame, catCol: String): DataFrame = {
    def shares(df: DataFrame, side: String): DataFrame = {
      val counts = df.groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(s"n_$side"))
      counts
        .crossJoin(broadcast(counts.agg(sum(col(s"n_$side")).as(s"_t_$side"))))
        .withColumn(s"share_$side",
          col(s"n_$side").cast("double") / col(s"_t_$side"))
        .drop(s"_t_$side")
    }
    shares(cur, "cur").join(shares(ref, "ref"), Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_cur", "n_ref"))
      .na.fill(0.0, Seq("share_cur", "share_ref"))
      .withColumn("tv_contrib", abs(col("share_cur") - col("share_ref")) / 2)
  }
}
