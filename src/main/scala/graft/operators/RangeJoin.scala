package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to the intervals containing them
  * on the same key. Spark plans a raw `BETWEEN` join as key-equi +
  * per-key residual, which degenerates to the full per-key product when
  * keys are hot; the scale shape is to EQUI-IZE the time dimension:
  *
  *  - intervals explode to the fixed-width time chunks they overlap
  *    (replication = interval length / chunk width, bounded and chosen);
  *  - points map to exactly ONE chunk;
  *  - the join is equi on (keys, chunk) — hash-shuffled like any join —
  *    with the exact `BETWEEN` as a cheap residual.
  *
  * Chunk width trades interval replication (long intervals → more chunk
  * rows) against chunk density (short chunks → fewer spurious candidates);
  * both sides stay linear, never per-key quadratic.
  */
object RangeJoin {

  /** @param chunkSeconds chunk width; intervals longer than this replicate
    *                     across ⌈len/width⌉ chunk rows
    * @param maxChunksPerInterval poison-row guard: one corrupt interval
    *                     (end_ts in year 9999 at chunkSeconds=600 would
    *                     explode to ~4×10⁸ chunk rows and OOM the stage) —
    *                     any interval spanning more chunks fails the job
    *                     with an error naming the offending bounds, the
    *                     same fail-loud discipline as the CSV reader's
    *                     single-split require
    * @return point rows + the matched interval's columns (inner semantics:
    *         unmatched points drop; a point inside k overlapping intervals
    *         yields k rows)
    */
  def pointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      chunkSeconds: Long = 3600L,
      maxChunksPerInterval: Long = 10000L): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(chunkSeconds > 0, "chunk width must be positive")
    require(maxChunksPerInterval > 0, "max chunks per interval must be positive")
    // The join is equi on (keys, _chunk) with a BETWEEN residual that
    // references both sides — any other shared column name would be
    // ambiguous at analysis time. Fail here with the offending names
    // instead of a Catalyst ambiguity error downstream.
    val shared = (intervals.columns.toSet intersect points.columns.toSet) -- keys
    require(shared.isEmpty,
      s"points and intervals share non-key columns [${shared.toSeq.sorted.mkString(", ")}]; " +
        "rename or project them away before the range join")
    val w = lit(chunkSeconds)
    val p = points.withColumn("_chunk",
      floor(col(tsCol).cast("long") / w))
    val startChunk = floor(col(startCol).cast("long") / w)
    val endChunk = floor(col(endCol).cast("long") / w)
    // Per-row poison guards, evaluated inside the plan (no driver pass):
    // inverted intervals would silently produce a descending (empty-after-
    // residual) chunk sequence; oversized intervals would OOM the explode.
    val guardedEnd =
      when(col(startCol) > col(endCol), raise_error(concat(
        lit(s"range join: inverted interval ($startCol > $endCol): "),
        col(startCol).cast("string"), lit(" > "), col(endCol).cast("string"))))
      .when(endChunk - startChunk >= lit(maxChunksPerInterval), raise_error(concat(
        lit(s"range join: interval spans more than $maxChunksPerInterval chunks " +
          s"of ${chunkSeconds}s: ["),
        col(startCol).cast("string"), lit(", "), col(endCol).cast("string"),
        lit("] — widen chunkSeconds, raise maxChunksPerInterval, or filter the row"))))
      .otherwise(endChunk)
    val iv = intervals.withColumn("_chunk", explode(sequence(startChunk, guardedEnd)))
    p.join(iv, keys :+ "_chunk")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_chunk")
  }
}
