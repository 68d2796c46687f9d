package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

class EventStreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling-window aggregation emits finalized windows") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.windowedEventCounts(
        input.toDF(), windowLength = "1 hour", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append).start()

    input.addData(
      Event(1, ts("2026-01-01 00:10:00"), 1, "click", 1.0),
      Event(2, ts("2026-01-01 00:40:00"), 2, "click", 2.0),
      Event(3, ts("2026-01-01 00:50:00"), 1, "view", 3.0))
    query.processAllAvailable()
    // advance the watermark past the first hour → its windows finalize
    input.addData(Event(4, ts("2026-01-01 02:30:00"), 1, "click", 4.0))
    query.processAllAvailable()
    val rows = spark.table("winagg").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      .toSet
    query.stop()
    assert(rows === Set(
      ("2026-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2026-01-01 00:00:00.0", "view", 1L, 3.0)))
  }

  test("flatMapGroupsWithState sessionization: in-batch gap close + event-time timeout") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapSeconds = 600,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()

    // user 1: two events 5 min apart (one session), then a 30-min gap →
    // second session opens in the same batch, closing the first inline
    input.addData(
      Event(1, ts("2026-01-01 00:00:00"), 1, "a", 1.0),
      Event(2, ts("2026-01-01 00:05:00"), 1, "a", 1.0),
      Event(3, ts("2026-01-01 00:35:00"), 1, "a", 1.0))
    query.processAllAvailable()
    // advance the watermark far past user 1's open session → timeout fires
    input.addData(Event(9, ts("2026-01-01 03:00:00"), 2, "b", 1.0))
    query.processAllAvailable()
    input.addData(Event(10, ts("2026-01-01 06:00:00"), 2, "b", 1.0))
    query.processAllAvailable()
    val sessions = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L)
      .map(x => (x.session_start.toString, x.session_end.toString, x.n_events))
      .toSet
    query.stop()
    assert(sessions === Set(
      ("2026-01-01 00:00:00.0", "2026-01-01 00:05:00.0", 2),
      ("2026-01-01 00:35:00.0", "2026-01-01 00:35:00.0", 1)))
  }

  test("dedupOnIngest drops in-batch and cross-batch replays within the watermark") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dedupOnIngest(input.toDF(),
        keyCols = Seq("event_id"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()

    // batch 1 carries an in-batch duplicate of event 1
    input.addData(
      Event(1, ts("2026-01-01 00:00:00"), 1, "click", 1.0),
      Event(1, ts("2026-01-01 00:00:01"), 1, "click", 1.0),
      Event(2, ts("2026-01-01 00:01:00"), 2, "view", 2.0))
    query.processAllAvailable()
    // batch 2 replays both events within the watermark window
    input.addData(
      Event(1, ts("2026-01-01 00:02:00"), 1, "click", 1.0),
      Event(2, ts("2026-01-01 00:03:00"), 2, "view", 2.0),
      Event(3, ts("2026-01-01 00:04:00"), 3, "click", 3.0))
    query.processAllAvailable()
    val ids = spark.table("deduped").collect().map(_.getAs[Long]("event_id"))
    query.stop()
    assert(ids.sorted.toSeq === Seq(1L, 2L, 3L), "each key exactly once")
  }

  test("enrich joins the stream against a broadcast dimension per microbatch") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("user_id", "segment")
    val input = MemoryStream[Event]
    val query = EventStreams.enrich(input.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()

    input.addData(
      Event(1, ts("2026-01-01 00:00:00"), 1, "click", 1.0),
      Event(2, ts("2026-01-01 00:01:00"), 3, "view", 2.0)) // user 3: no dim row
    query.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment")).toMap
    query.stop()
    assert(rows === Map(1L -> "alpha", 2L -> null))
  }

  test("streaming funnel state survives micro-batch boundaries") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.funnelOnStream(input.toDS(),
        steps = Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnelprog")
      .outputMode(OutputMode.Append).start()

    // batch 1: user 1 views; user 2 clicks first (never enters)
    input.addData(
      Event(1, ts("2026-01-01 00:01:00"), 1, "view", 0.0),
      Event(2, ts("2026-01-01 00:02:00"), 2, "click", 0.0))
    query.processAllAvailable()
    // batch 2: user 1 clicks then purchases — state carried from batch 1;
    // user 2 views (enters at step 1 only: its click was BEFORE the view)
    input.addData(
      Event(3, ts("2026-01-01 00:10:00"), 1, "click", 0.0),
      Event(4, ts("2026-01-01 00:20:00"), 1, "purchase", 0.0),
      Event(5, ts("2026-01-01 00:15:00"), 2, "view", 0.0))
    query.processAllAvailable()
    val finalReached = spark.table("funnelprog").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("reached")))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    query.stop()
    assert(finalReached === Map(1L -> 3, 2L -> 1),
      "user 1 must complete across batches; user 2's pre-view click is dead")
  }

  test("streaming funnel folds at microsecond precision like the batch operator") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    // user 1: three steps 100 MICROSECONDS apart inside one millisecond —
    // a millisecond fold sees equal times and stalls at step 1;
    // user 2: view and click at the SAME microsecond — strict ordering
    // must refuse the advance, exactly as the batch fold does
    val evs = Seq(
      Event(1, ts("2026-01-01 00:00:00.0001"), 1, "view", 0.0),
      Event(2, ts("2026-01-01 00:00:00.0002"), 1, "click", 0.0),
      Event(3, ts("2026-01-01 00:00:00.0003"), 1, "purchase", 0.0),
      Event(4, ts("2026-01-01 00:00:00.0001"), 2, "view", 0.0),
      Event(5, ts("2026-01-01 00:00:00.0001"), 2, "click", 0.0))
    val input = MemoryStream[Event]
    val query = EventStreams.funnelOnStream(input.toDS(),
        steps = Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnelus")
      .outputMode(OutputMode.Append).start()
    input.addData(evs: _*)
    query.processAllAvailable()
    val streamed = spark.table("funnelus").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("reached")))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    query.stop()
    assert(streamed === Map(1L -> 3, 2L -> 1),
      "sub-millisecond steps must advance; same-microsecond steps must not")
    // drain ≡ batch on the same sub-millisecond fixture
    val batchReached = graft.operators.Funnel.funnel(
        evs.toDF(), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(org.apache.spark.sql.functions.col("step")).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
    assert(batchReached === Map(1 -> 2, 2 -> 1, 3 -> 1),
      "batch operator agrees: both users enter, only user 1 advances")
  }

  test("streaming funnel evicts idle state once the watermark passes the horizon") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.funnelOnStream(input.toDS(),
        steps = Seq("view", "click", "purchase"),
        watermarkDelay = "1 second", idleTimeoutMs = 60_000L)
      .writeStream.format("memory").queryName("funnelevict")
      .outputMode(OutputMode.Append).start()
    // user 1 reaches step 2, then goes idle past the 1-minute horizon
    input.addData(
      Event(1, ts("2026-01-01 00:00:00"), 1, "view", 0.0),
      Event(2, ts("2026-01-01 00:00:10"), 1, "click", 0.0))
    query.processAllAvailable()
    // another user's event drives the watermark far past user 1's
    // deadline (00:01:10) → the timeout fires and evicts user 1's state
    input.addData(Event(3, ts("2026-01-01 01:00:00"), 2, "view", 0.0))
    query.processAllAvailable()
    // post-eviction: a purchase would have completed the old funnel, but
    // the funnel must restart cleanly at step 0 — the purchase is dead,
    // the following view re-enters at step 1
    input.addData(
      Event(4, ts("2026-01-01 01:10:00"), 1, "purchase", 0.0),
      Event(5, ts("2026-01-01 01:11:00"), 1, "view", 0.0))
    query.processAllAvailable()
    val u1 = spark.table("funnelevict").collect()
      .filter(_.getAs[Long]("user_id") == 1L).map(_.getAs[Int]("reached")).toSeq
    query.stop()
    assert(!u1.contains(3), "evicted state must not resurrect to complete")
    assert(u1.max === 2 && u1.last === 1,
      s"expected pre-eviction progress 2 then a clean restart at 1, got $u1")
  }

  test("streaming funnel evicts on completion; later events restart independently") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.funnelOnStream(input.toDS(),
        steps = Seq("view", "click"))
      .writeStream.format("memory").queryName("funneldone")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts("2026-01-01 00:00:00"), 1, "view", 0.0),
      Event(2, ts("2026-01-01 00:01:00"), 1, "click", 0.0))
    query.processAllAvailable()
    // completed state was removed; this view starts a FRESH funnel and
    // must emit reached=1, not re-emit the completed 2
    input.addData(Event(3, ts("2026-01-01 00:05:00"), 1, "view", 0.0))
    query.processAllAvailable()
    val u1 = spark.table("funneldone").collect()
      .map(r => r.getAs[Int]("reached")).toSeq
    query.stop()
    assert(u1 === Seq(2, 1),
      s"completion then an independent restart, got $u1")
  }
}
