package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window feature engineering over an event stream: for every
  * event, aggregates of the same key's events in the preceding
  * `windowSeconds` (inclusive of the current instant) — "clicks in the
  * last hour", "spend in the last day", the standard ML feature shapes.
  *
  * A RANGE window frame over epoch seconds, partitioned by key: one hash
  * exchange on the key plus a per-key sort — the same cost as any keyed
  * window, parallel across keys, no state beyond the frame. RANGE (not
  * ROWS) makes simultaneous events symmetric: all events sharing a
  * timestamp see each other, so results are layout-independent and replay
  * exactly in SQL.
  *
  * Reference scope: the reference's per-entity summary surface
  * (control_migration_schema_script.sql:516–540) extended to event-time
  * features per SURVEY §2.
  */
object EventFeatures {

  /** Input columns plus `n_events_w` / `sum_value_w` over the trailing
    * window. */
  def trailingWindow(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      windowSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-(windowSeconds - 1), Window.currentRow)
    df.withColumn("n_events_w", count(lit(1)).over(w))
      .withColumn("sum_value_w", sum(col(valueCol)).over(w))
  }
}
