package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` on the same key (the event/state alignment every
  * CDC + event pipeline eventually needs; Spark has no native asof join).
  *
  * Implemented the scale-correct way: UNION-MERGE, not a range join.
  * Both inputs union into one stream tagged (right = 0, left = 1), one
  * shuffle partitions by key, and a running `last(value, ignoreNulls)`
  * window ordered by (ts, tag) carries each right value forward to every
  * later left row. Cost is one shuffle + one sort over |L| + |R| rows —
  * a range join (`l.ts >= r.ts` predicate) would explode to the product
  * within each key before filtering, and an exploded-interval join needs
  * bucketing assumptions. Equal timestamps match (`>=`): the tag orders
  * right rows first.
  *
  * Right rows must be unique per (keys, ts) for a deterministic result —
  * pre-aggregate otherwise (the caller knows which reduction is right).
  *
  * The right value columns travel as ONE non-null struct per right row and
  * a single `last(ignoreNulls)` carries the struct — so every output row's
  * carried columns come from the SAME right row, and a NULL inside the
  * latest right row stays NULL (a per-column carry would skip it and leak a
  * stale value from an older right row — not ASOF semantics).
  */
object AsOfJoin {

  /** @param rightVals right columns carried onto matching left rows, each
    *                  surfaced as `<prefix><name>` (all null when no right
    *                  row is at-or-before the left row — left-join
    *                  semantics; individually null when the matched right
    *                  row holds a null)
    */
  def latestAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(rightVals.nonEmpty, "as-of join needs at least one right value column")
    val leftOther = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val payload = "_asof_payload"
    val payloadType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))

    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        Seq(struct(rightVals.map(col): _*).as(payload)) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_tag"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        Seq(lit(null).cast(payloadType).as(payload)) ++
        leftOther.map(col) :+
        lit(1).as("_tag"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
    carried.filter(col("_tag") === 1)
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftOther.map(col) ++
        rightVals.map(c => col(s"$payload.$c").as(s"$prefix$c")): _*)
  }
}
