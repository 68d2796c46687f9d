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
  */
object AsOfJoin {

  /** @param rightVals right columns carried onto matching left rows, each
    *                  surfaced as `<prefix><name>` (null when no right row
    *                  is at-or-before the left row — left-join semantics)
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

    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        rightVals.map(c => col(c).as(s"$prefix$c")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_tag"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"$prefix$c")) ++
        leftOther.map(col) :+
        lit(1).as("_tag"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(taggedRight.unionByName(taggedLeft)) { (df, c) =>
      df.withColumn(s"$prefix$c", last(col(s"$prefix$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1).drop("_tag")
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftOther.map(col) ++
        rightVals.map(c => col(s"$prefix$c")): _*)
  }
}
