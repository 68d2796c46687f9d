package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private def ev(rows: (Long, Int, String)*) = {
    val s = spark; import s.implicits._
    rows.map { case (u, m, t) => (u, ts(m), t) }.toDF("user_id", "ts", "event_type")
  }

  test("greedy earliest matching: order, strictness, and partial funnels") {
    val df = ev(
      // user 1 completes all three in order
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      // user 2: purchase BEFORE the click — stops at click
      (2L, 1, "view"), (2L, 2, "purchase"), (2L, 3, "click"),
      // user 3: click at the SAME minute as view — strict > rejects it
      (3L, 1, "view"), (3L, 1, "click"),
      // user 4: never views — contributes nothing
      (4L, 1, "click"), (4L, 2, "purchase"),
      // user 5: noise types interleaved, still completes
      (5L, 1, "error"), (5L, 2, "view"), (5L, 3, "signup"),
      (5L, 4, "click"), (5L, 5, "purchase"))
    val out = Funnel.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(col("step")).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 3L, 2L),
      "view: users 1,2,3,5; click: 1,2,5; purchase: 1,5")
    assert(out.map(_.getDouble(3)).toSeq === Seq(1.0, 0.75, 0.5))
    assert(out.map(_.getString(1)).toSeq === Seq("view", "click", "purchase"))
  }

  test("greedy fold equals the stepwise-min formulation") {
    val s = spark; import s.implicits._
    // deterministic pseudo-random event soup over 40 users
    val rows = for {
      u <- 1L to 40L
      i <- 1 to 12
    } yield {
      val h = math.abs((u * 31 + i * 17) % 7)
      val t = Seq("view", "click", "purchase", "error", "view", "click", "signup")(h.toInt)
      (u, ts(((u * 13 + i * 29) % 55).toInt + 1), t)
    }
    val df = rows.toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val out = Funnel.funnel(df.repartition(7), "user_id", "ts", "event_type", steps)
      .orderBy(col("step")).collect().map(_.getLong(2)).toSeq
    // stepwise replay in Scala
    val byUser = rows.groupBy(_._1)
    def reach(u: Long): Int = {
      val evs = byUser(u).map(r => (r._2.getTime, r._3)).sortBy(_._1)
      var idx = 0; var last = Long.MinValue
      for ((t, ty) <- evs if idx < steps.size)
        if (ty == steps(idx) && (idx == 0 || t > last)) { idx += 1; last = t }
      idx
    }
    val expected = (1 to 3).map(i => byUser.keys.count(reach(_) >= i).toLong)
    assert(out === expected)
  }

  test("funnel plan: one user exchange + one global row, no window, no join cascade") {
    val df = ev((1L, 1, "view"), (1L, 2, "click"))
    val plan = Funnel.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no windows over the event stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no per-step join cascade:\n$plan")
  }

  test("repeated step types are rejected") {
    val df = ev((1L, 1, "view"))
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, "user_id", "ts", "event_type", Seq("view", "view"))
    }
  }
}
