package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary buffer: at most k (item, count)
  * counters over a string stream.
  *
  * Update (Misra & Gries, "Finding repeated elements", Sci. Comput.
  * Program. 1982): an arriving item increments its counter or claims a
  * free slot; at capacity, ONE is subtracted from every counter and the
  * arrival is absorbed by the same subtraction. Each decrement event
  * removes exactly one unit from k stored counters AND the arrival —
  * k+1 items charged simultaneously — so there are at most n/(k+1)
  * events, every stored count is a LOWER bound within n/(k+1) of the
  * item's true frequency, and every item with true frequency > n/(k+1)
  * is guaranteed a surviving counter. (A decrement-by-min variant is
  * tempting — fewer events — but it charges m units to only mk+1
  * weight, weakening the bound to n/k and breaking the k+1 > 1/θ
  * sizing arithmetic [[graft.operators.Sketches.heavyHitters]] builds
  * on; concretely, k=3 over a,a,a,a,b,b,b,b,c,c,c,c,d empties the
  * whole summary at d although a/b/c all clear n/(k+1).)
  *
  * Merge (Agarwal et al., "Mergeable summaries", PODS 2012): pointwise
  * add, then subtract the (k+1)-th largest count and drop non-positives.
  * The same charging argument carries the n/(k+1) error bound through
  * ANY merge tree — which is what makes the aggregate safe as a Spark
  * partial aggregate, where partition merge order is scheduler-driven.
  * The surviving SET is merge-order-dependent (only the guarantee is
  * canonical); callers wanting a deterministic answer verify candidates
  * with an exact second pass ([[graft.operators.Sketches.heavyHitters]]).
  */
final class MisraGriesBuffer(val k: Int) {
  var n: Long = 0L
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // capacity: subtract ONE from every counter and from the
        // arrival's implicit count of 1 (the arrival dies with it) —
        // exactly one unit per k+1 items, the bound's charging argument
        subtractAll(1)
    }
  }

  /** Subtract `t` from every counter, dropping non-positives. */
  private def subtractAll(t: Long): Unit =
    if (t > 0) {
      val dead = counts.iterator.filter(_._2 <= t).map(_._1).toList
      dead.foreach(counts.remove)
      counts.mapValuesInPlace((_, c) => c - t)
    }

  def merge(other: MisraGriesBuffer): Unit = {
    n += other.n
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    if (counts.size > k) {
      // (k+1)-th largest count is the truncation threshold
      val sorted = counts.valuesIterator.toArray
      java.util.Arrays.sort(sorted)
      subtractAll(sorted(sorted.length - k - 1))
    }
  }
}

/** The Misra–Gries summary as a `TypedImperativeAggregate`.
  *
  * Output: `struct<n: bigint, items: array<string>, counts: array<bigint>>`
  * — `n` the number of non-null rows folded, and the surviving counters
  * sorted by (count desc, item asc) for stable display. Each count is a
  * lower bound on the item's true frequency, within `n/(k+1)` of it; any
  * item with true frequency > `n/(k+1)` is present. NULL items are
  * skipped (they carry no identity, matching count(DISTINCT) style
  * exclusions elsewhere in the sketch family).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(k >= 1, "summary size must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(k)

  override def update(buf: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    // copy out of the row's reusable buffer before storing
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MisraGriesBuffer): Any = {
    val entries = buf.counts.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(_._2: Any))))
  }

  override def serialize(buf: MisraGriesBuffer): Array[Byte] = {
    val items = buf.counts.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(16 + bytes.map(_.length + 12).sum)
    bb.putLong(buf.n).putInt(buf.k).putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length).put(bytes(i)).putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong(); val cap = bb.getInt(); val size = bb.getInt()
    val buf = new MisraGriesBuffer(cap)
    buf.n = n
    (0 until size).foreach { _ =>
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object MisraGries {
  /** Aggregate column: `struct<n, items, counts>` — the Misra–Gries
    * heavy-hitter summary of size k. */
  def misra_gries(value: Column, k: Int): Column =
    ExpressionUtils.column(MisraGries(
      ExpressionUtils.expression(value), k).toAggregateExpression())
}
