package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users are bucketed by the week
  * of their FIRST activity (the cohort), and each later week of activity
  * marks them retained at that week offset — the "of the users acquired
  * in week W, how many came back k weeks later" matrix every growth
  * dashboard draws.
  *
  * Scale shape: two aggregates on the SAME user key — first-activity per
  * user and distinct (user, week) activity — then a co-partitioned join
  * on that key (no second shuffle of the bigger side under AQE's
  * exchange reuse) and a small (cohort × offset) count. No windows over
  * the corpus, no self-join of the event stream; the output is bounded
  * by cohorts × observed offsets regardless of event volume.
  *
  * Weeks are `date_trunc('week', ts)` — Monday-start in both Spark and
  * the SQL oracle's engine, so the bucketing replays exactly.
  */
object Retention {

  /** Retention matrix: (cohort_week, week_offset, n_active, retention).
    *
    * `retention` = n_active / cohort size (offset 0 row is the cohort
    * size itself, retention 1.0), rounded to 6. Offsets are whole weeks:
    * `floor(days(activity_week − cohort_week) / 7)` — weeks are aligned
    * by the truncation, so the division is exact.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val clean = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol)).cast("date").as("_wk"))
    // first-activity week per user — the cohort assignment
    val cohorts = clean.groupBy(col("_u"))
      .agg(min(col("_wk")).as("cohort_week"))
    // distinct (user, week) activity; join is co-partitioned on _u
    val activity = clean.distinct()
    val marked = activity.join(cohorts, Seq("_u"))
      .select(col("cohort_week"),
        (datediff(col("_wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
    val counts = marked.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // cohort size = the offset-0 count (every user is active in their
    // own first week by construction); broadcast it back for the ratio
    val sizes = counts.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("_cohort_size"))
    counts.join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("_cohort_size").cast("double"), 6)
          .as("retention"))
  }
}
