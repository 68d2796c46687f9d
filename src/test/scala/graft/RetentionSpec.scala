package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Retention

class RetentionSpec extends SparkSpec {

  // Mondays: 2026-01-05, -12, -19 are consecutive week starts
  private def ts(day: Int, h: Int = 9) =
    Timestamp.valueOf(f"2026-01-$day%02d $h%02d:00:00")

  private def ev(rows: (Long, Timestamp)*) = {
    val s = spark; import s.implicits._
    rows.toDF("user_id", "ts")
  }

  test("cohort matrix: offsets, sizes, and the retention ratio") {
    val df = ev(
      // cohort week 1 (Jan 5): users 1, 2, 3
      (1L, ts(5)), (2L, ts(6)), (3L, ts(7)),
      // week 2: users 1, 2 return; user 4 is a NEW cohort
      (1L, ts(12)), (2L, ts(14)), (4L, ts(13)),
      // week 3: user 1 returns; user 4 returns
      (1L, ts(19)), (4L, ts(20)),
      // same-week repeat activity must not double-count
      (1L, ts(5, 23)), (1L, ts(6)))
    val out = Retention.cohortRetention(df, "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset")).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("2026-01-05", 0, 3L, 1.0),
      ("2026-01-05", 1, 2L, 0.666667),
      ("2026-01-05", 2, 1L, 0.333333),
      ("2026-01-12", 0, 1L, 1.0),
      ("2026-01-12", 1, 1L, 1.0)))
  }

  test("retention is deterministic under repartitioning") {
    val s = spark; import s.implicits._
    val rows = (1L to 200L).flatMap { u =>
      (0 to (u % 5).toInt).map { w =>
        (u, Timestamp.valueOf(java.time.LocalDate.of(2026, 1, 5)
          .plusWeeks(w).atTime(9, 0)))
      }
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Retention.cohortRetention(df, "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset")).collect()
        .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(run(rows.toDF("user_id", "ts")) ===
      run(scala.util.Random.shuffle(rows).toDF("user_id", "ts").repartition(11)))
  }

  test("retention plan: no window, no cartesian; output bounded by cohorts x offsets") {
    val df = ev((1L, ts(5)), (1L, ts(12)), (2L, ts(6)))
    val plan = Retention.cohortRetention(df, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no windows over the event stream:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), s"no cross product:\n$plan")
  }
}
