package graft

import java.sql.Timestamp
import graft.operators.EventFeatures

class EventFeaturesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, 10.0),
      (2L, ts("2026-01-01 10:30:00"), 1L, 20.0),
      (3L, ts("2026-01-01 10:59:59"), 1L, 30.0), // within 1h of event 1
      (4L, ts("2026-01-01 11:00:00"), 1L, 40.0), // event 1 just expired
      (5L, ts("2026-01-01 10:30:00"), 2L, 99.0)) // other user, same instant
      .toDF("event_id", "ts", "user_id", "value")
  }

  test("trailing window counts exactly the preceding windowSeconds, per key") {
    val m = EventFeatures.trailingWindow(events(), Seq("user_id"), "ts", "value",
        windowSeconds = 3600)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_events_w"), r.getAs[Double]("sum_value_w"))).toMap
    assert(m(1L) === ((1L, 10.0)))
    assert(m(2L) === ((2L, 30.0)))
    assert(m(3L) === ((3L, 60.0)))          // 10:00:00 still inside [09:00:01, 10:59:59]
    assert(m(4L) === ((3L, 90.0)))          // event 1 (10:00:00) expired at 11:00:00
    assert(m(5L) === ((1L, 99.0)))          // keys are independent
  }

  test("simultaneous events see each other symmetrically (RANGE, not ROWS)") {
    val s = spark; import s.implicits._
    val sim = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, 1.0),
      (2L, ts("2026-01-01 10:00:00"), 1L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val m = EventFeatures.trailingWindow(sim, Seq("user_id"), "ts", "value", 60)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_events_w")).toMap
    assert(m(1L) === 2L && m(2L) === 2L)
  }

  test("plan: keyed window, no single-partition stage") {
    val plan = EventFeatures.trailingWindow(events(), Seq("user_id"), "ts", "value", 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"window must partition by key:\n$plan")
  }
}
