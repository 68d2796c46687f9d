package graft.operators

/** Execution configuration for the pure-batch jobs an admission/upsert
  * drain runs inside `foreachBatch` — sized for a MICRO-batch, not an
  * open-ended query.
  *
  * Default Spark gives a drain the worst of both worlds. The streaming
  * clone of the session disables AQE (`ResolveWriteToStream`'s guard —
  * AQE cannot re-plan a streaming plan mid-flight), so every shuffle in
  * every drain job runs at the full `spark.sql.shuffle.partitions` width
  * regardless of batch size (measured on q144: ~75 near-empty 32-task
  * stages per 3-drain run, ~100 ms of task-launch latency each).
  * Re-enabling AQE fixes the widths but replaces the cost with a worse
  * one: AQE executes every shuffle stage as its OWN job with a driver
  * re-plan — ~50-100 ms per stage on the ~25-stage drain chains, which
  * dominates a micro-batch outright (measured: no net win).
  *
  * [[withDrainConf]] instead pins the drain's batch jobs to a SMALL
  * FIXED shuffle width with plain single-job DAG scheduling, for the
  * duration of one foreachBatch body, restoring the prior conf after.
  * Safe because the callback is synchronous in the micro-batch loop —
  * the engine neither plans nor executes the STREAMING plan while the
  * body runs — and the cloned session is exclusive to this query, so no
  * other stream observes the flip. */
private[graft] object DrainConf {
  /** Shuffle width for the drain's batch jobs. A micro-batch is bounded
    * by the trigger policy (maxFilesPerTrigger / maxOffsetsPerTrigger),
    * so unlike an open-ended batch query its right shuffle width is
    * small and deployment-known — the default of 8 suits drains up to a
    * few hundred MB; size `spark.graft.drainShufflePartitions` to
    * (drain bytes / target partition size) for bigger triggers. */
  private val PartitionsKey = "spark.graft.drainShufflePartitions"

  private def overrides(spark: org.apache.spark.sql.SparkSession): Seq[(String, String)] = {
    val parts = spark.conf.getOption(PartitionsKey).getOrElse("8")
    Seq(
      // AQE would right-size the widths adaptively, but it executes every
      // shuffle stage as its own job with a driver re-plan — measured
      // ~50-100 ms per stage on the ~25-stage drain chains, it DOMINATES
      // a micro-batch drain. A fixed small width with single-job DAG
      // scheduling is faster at every drain size the trigger allows.
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> parts)
  }

  def withDrainConf[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A =
    withOverrides(spark, overrides(spark))(body)

  /** Shuffle width for a STATEFUL streaming query's own plan (windowed
    * aggregation, flatMapGroupsWithState, dropDuplicatesWithinWatermark).
    * The state-store partition count is pinned to
    * `spark.sql.shuffle.partitions` at QUERY START and every micro-batch
    * then runs that many stateful tasks, each paying state-store
    * open/replay/commit — at the session width of a 32-core host that is
    * ~32 near-empty state tasks per drain on a trigger-bounded batch
    * (measured q103: 32-task FlatMapGroupsWithState stages at 12–19 s of
    * executor time per 0.6 s of wall). A micro-batch is trigger-bounded,
    * so the right width is small and deployment-known: size
    * `spark.graft.streamStatePartitions` to the live key cardinality ÷
    * target state-partition size in production; the default (the drain
    * width) suits trigger-bounded local drains. */
  private val StatePartitionsKey = "spark.graft.streamStatePartitions"

  /** Run a stateful streaming query's start→drain under the stream state
    * width: the conf flip must cover QUERY START (the engine clones the
    * session conf then), so wrap `start().awaitTermination()`, not the
    * foreachBatch body. Restores the session conf after the drain; safe
    * because the drained session is exclusive to the caller (the
    * [[withDrainConf]] argument). */
  def withStreamStateConf[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val parts = spark.conf.getOption(StatePartitionsKey)
      .orElse(spark.conf.getOption(PartitionsKey)).getOrElse("8")
    withOverrides(spark, Seq("spark.sql.shuffle.partitions" -> parts))(body)
  }

  private def withOverrides[A](
      spark: org.apache.spark.sql.SparkSession,
      o: Seq[(String, String)])(body: => A): A = {
    val prev = o.map { case (k, _) => k -> spark.conf.getOption(k) }
    o.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
