package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over an event stream
  * (event_id, ts, user_id, event_type, value) — the Structured Streaming
  * surface beyond CDC file ingestion: watermarked windowed aggregation and
  * custom session state via flatMapGroupsWithState.
  *
  * Both transforms are source-agnostic (work on `readStream` or batch
  * DataFrames); state lives in Spark's checkpointed state store, which is
  * what makes them viable on an unbounded 100 TB-class stream — per-key
  * state is bounded by the watermark, and the shuffle is the usual
  * hash-partition on the grouping key.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a lateness watermark:
    * late events beyond `watermarkDelay` are dropped and their windows
    * finalized (enabling append-mode emission + state eviction). */
  def windowedEventCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Int, totalValue: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Custom session state: per-user sessions closed after `gapSeconds` of
    * event-time silence. Sessions complete either when a later event in the
    * same group leaves a gap (emitted immediately) or when the watermark
    * passes the gap deadline (event-time timeout). */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.startMs),
              new Timestamp(s.lastMs), s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapSeconds * 1000 =>
                  // a late-but-in-watermark event may precede the current
                  // session start — widen both ends
                  cur = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    nEvents = s.nEvents + 1, totalValue = s.totalValue + e.value))
                case Some(s) => // gap exceeded within the batch: close + restart
                  closed += Session(userId, new Timestamp(s.startMs),
                    new Timestamp(s.lastMs), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes last-event + gap
              state.setTimeoutTimestamp(s.lastMs + gapSeconds * 1000)
            }
            closed.result().iterator
          }
      }
  }

  final case class FunnelState(idx: Int, lastUs: Long)
  final case class FunnelProgress(user_id: Long, reached: Int)

  /** Event-time MICROSECONDS of a timestamp — the precision the batch
    * funnel folds at (`unix_micros`); folding streams at milliseconds
    * would let two step events inside the same millisecond advance the
    * batch funnel but not the streaming one. */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Streaming funnel progress: the stateful face of
    * [[graft.operators.Funnel.funnel]] — per-user greedy earliest-
    * completion matching carried ACROSS micro-batches in checkpointed
    * state (step index + last-match event time in micros, a dozen bytes
    * per user).
    *
    * Each batch folds the user's arriving events in (ts, event_id) order
    * through the same strict-ordering rule AND the same microsecond
    * precision as the batch operator, and emits the user's current
    * `reached` step when it is > 0. `reached` is MONOTONE, so the
    * drained output reduces to the batch answer with `max(reached) per
    * user` — which is exactly how the declared query's hash gate replays
    * it against the batch-funnel oracle. The equivalence holds when
    * per-user event order is non-decreasing across batches (a
    * time-partitioned ingest); out-of-order delivery WITHIN a batch is
    * handled by the sort.
    *
    * State is BOUNDED two ways (the sessionize pattern):
    *  - completion: a user who reaches the last step can never advance
    *    again, so the state is removed immediately (a later event
    *    restarts an independent funnel — harmless under the max() gate);
    *  - idleness: an event-time timeout evicts a user whose last event
    *    is `idleTimeoutMs` behind the watermark. An evicted user's next
    *    event restarts at step 0, so `idleTimeoutMs` is the retention
    *    horizon for in-flight funnels — size it to the longest
    *    step-to-step gap worth honoring (default 30 days), NOT to
    *    Long.MaxValue, or state grows with the all-time user count. */
  def funnelOnStream(
      events: Dataset[Event],
      steps: Seq[String],
      watermarkDelay: String = "30 minutes",
      idleTimeoutMs: Long = 30L * 24 * 3600 * 1000): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be nonempty and distinct")
    require(idleTimeoutMs > 0, "idleTimeoutMs must be positive")
    import events.sparkSession.implicits._
    val stepList = steps.toList
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // idle past the retention horizon: every reached step was
            // already emitted when it advanced — just evict
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            sorted.foreach { e =>
              val us = micros(e.ts)
              if (st.idx < stepList.size && e.event_type == stepList(st.idx) &&
                  (st.idx == 0 || us > st.lastUs))
                st = FunnelState(st.idx + 1, us)
            }
            if (st.idx >= stepList.size) {
              // complete — nothing can advance further; evict now
              state.remove()
            } else {
              state.update(st)
              // rows is non-empty when not a timeout invocation; the
              // deadline must stay ahead of the current watermark
              val lastSeenMs = sorted.map(_.ts.getTime).max
              state.setTimeoutTimestamp(math.max(lastSeenMs + idleTimeoutMs,
                state.getCurrentWatermarkMs() + 1))
            }
            if (st.idx > 0) Iterator.single(FunnelProgress(userId, st.idx))
            else Iterator.empty
          }
      }
  }

  /** Streaming exact dedup on ingest: the first row per `keyCols` wins,
    * replays and copies arriving within `watermarkDelay` are dropped.
    *
    * This is the streaming face of the batch exact-dedup operator: on an
    * unbounded ingest feed the dedup state cannot be "the whole corpus", so
    * the watermark bounds it — per-key state is evicted once the watermark
    * passes, which caps state-store size by the ingest rate × delay window
    * rather than by corpus size. Duplicates farther apart than the
    * watermark are the batch operator's job (run it on the compacted
    * corpus); this one kills the overwhelmingly-common near-in-time
    * replays (retried uploads, at-least-once sources) before they are ever
    * written.
    */
  def dedupOnIngest(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join an unbounded stream against a bounded
    * dimension table. The static side is explicitly broadcast — the stream
    * side must never shuffle for a dimension lookup (a per-microbatch
    * shuffle of the stream is the classic streaming-join scale bug; the
    * dimension is re-read per batch either way, so small dims belong on the
    * broadcast side). */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)
}
