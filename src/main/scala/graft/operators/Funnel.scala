package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel analysis over an event stream: how many users complete step 1,
  * then step 2 strictly after it, then step 3 strictly after that, ...
  *
  * Matching is EARLIEST-COMPLETION (greedy): the user's first step-1
  * event anchors the funnel, the first step-2 event strictly after it
  * advances, and so on. Greedy-earliest is equivalent to the stepwise
  * `min(ts) WHERE ts > prev` formulation (an exchange argument: taking
  * an earlier occurrence never forecloses a later step), which is
  * exactly how the SQL oracle replays it — so the per-user fold and the
  * window-free SQL agree row-for-row.
  *
  * Scale shape: events are first FILTERED to the step types (the funnel
  * alphabet — usually a small fraction of the stream), then ONE hash
  * exchange on the user key feeds a per-user `sort_array(collect_list)`
  * + a linear higher-order fold; the global per-step counts are a 1-row
  * conditional aggregate. No windows over the corpus, no per-step join
  * cascade (the K-pass stepwise form pays K co-partitioned shuffles;
  * the fold pays one). Per-user state is bounded by that user's
  * step-typed events — the caller's filter, not the whole stream.
  */
object Funnel {

  /** Per-step completion counts for the ordered `steps` funnel.
    *
    * Output, one row per step: (step 1-indexed, step_type, n_users,
    * conversion = n_users / step-1 users, rounded to 6).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous under greedy matching — encode " +
        "repeats as distinct event types upstream")
    val k = steps.size
    val stepArr = lit(steps.toArray)

    // one narrow filter to the funnel alphabet, one exchange on the user
    val relevant = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(steps: _*))
      .select(col(userCol).as("_u"), col(tsCol).cast("timestamp").as("_ts"),
        col(typeCol).as("_t"))
    // greedy fold over the user's ts-sorted events: state = (next step
    // index 1-based grown to k+1, ts of the last matched step). Strict
    // `>` keeps same-timestamp events from satisfying two steps at once,
    // which also makes the order among equal timestamps irrelevant.
    val folded = relevant
      .groupBy(col("_u"))
      .agg(sort_array(collect_list(struct(col("_ts"), col("_t")))).as("_evs"))
      .select(col("_u"),
        aggregate(col("_evs"),
          struct(lit(1).as("idx"), lit(Long.MinValue).as("last")),
          (st, e) => {
            val matches = st.getField("idx") <= k &&
              e.getField("_t") === element_at(stepArr, st.getField("idx")) &&
              (st.getField("idx") === 1 ||
                unix_micros(e.getField("_ts")) > st.getField("last"))
            when(matches, struct((st.getField("idx") + 1).as("idx"),
              unix_micros(e.getField("_ts")).as("last")))
              .otherwise(st)
          }).getField("idx").minus(1).as("_reached"))
    // 1-row global conditional aggregate → K output rows
    val countCols = (1 to k).map(i =>
      sum(when(col("_reached") >= i, 1L).otherwise(0L)).as(s"_c$i"))
    folded.agg(countCols.head, countCols.tail: _*)
      .select(col("_c1"), posexplode(array((1 to k).map(i => col(s"_c$i")): _*)))
      .select((col("pos") + 1).cast("int").as("step"),
        element_at(stepArr, col("pos") + 1).as("step_type"),
        col("col").as("n_users"),
        round(when(col("_c1") > 0,
          col("col").cast("double") / col("_c1").cast("double"))
          .otherwise(lit(0.0)), 6).as("conversion"))
  }
}
