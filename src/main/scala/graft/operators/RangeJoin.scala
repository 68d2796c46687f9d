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
      chunkSeconds: Long = 3600L): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(chunkSeconds > 0, "chunk width must be positive")
    val w = lit(chunkSeconds)
    val p = points.withColumn("_chunk",
      floor(col(tsCol).cast("long") / w))
    val iv = intervals.withColumn("_chunk", explode(sequence(
      floor(col(startCol).cast("long") / w),
      floor(col(endCol).cast("long") / w))))
    p.join(iv, keys :+ "_chunk")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_chunk")
  }
}
