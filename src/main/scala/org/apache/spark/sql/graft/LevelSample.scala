package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Size-bounded level sample of (hash, value) pairs — the deterministic
  * quantile-sketch buffer.
  *
  * Geometric-level discipline as in KLL (Karnin/Lang/Liberty, "Optimal
  * quantile approximation in streams", FOCS 2016), but the compaction
  * coin is a deterministic hash bit instead of a random one (the
  * distinct-sampling idea of Gibbons & Matias, SIGMOD 2001): an item
  * survives to level L iff `hash mod 2^L == 0`, and the buffer escalates
  * one level whenever it holds more than `b` survivors. Because the
  * survivor set at any level is a pure function of the input SET of
  * hashes — never of arrival order or partitioning — the final state is
  * canonical: level = the minimal L whose global survivor count fits in
  * `b`, items = exactly that global survivor set. That is what makes the
  * sketch SQL-replayable and the merge associative by construction
  * (overflow in a partial buffer only happens when the global count at
  * that level also overflows, so partials never overshoot the canonical
  * level).
  *
  * Contrast with random-coin KLL: same space discipline and geometric
  * weights, but deterministic; the price is the sample is uniform
  * bottom-hash (error O(1/sqrt(b)) for quantiles) rather than KLL's
  * compaction-optimal O(1/b). For corpus profiling that trade buys exact
  * replay in any engine.
  */
final class LevelSampleBuffer(val b: Int) {
  var level: Int = 0
  var size: Int = 0
  var hashes: Array[Long] = new Array[Long](math.min(b + 1, 64))
  var values: Array[Double] = new Array[Double](math.min(b + 1, 64))

  private def mask: Long = (1L << level) - 1L // hv mod 2^level == hv & mask

  private def grow(need: Int): Unit = {
    if (need > hashes.length) {
      val cap = math.max(need, hashes.length * 2)
      hashes = java.util.Arrays.copyOf(hashes, cap)
      values = java.util.Arrays.copyOf(values, cap)
    }
  }

  /** Drop items not surviving the current level; escalate while over b. */
  private def compact(): Unit = {
    while (size > b) {
      level += 1
      val m = mask
      var w = 0
      var i = 0
      while (i < size) {
        if ((hashes(i) & m) == 0L) {
          hashes(w) = hashes(i); values(w) = values(i); w += 1
        }
        i += 1
      }
      size = w
    }
  }

  def add(hv: Long, v: Double): Unit = {
    if ((hv & mask) != 0L) return
    grow(size + 1)
    hashes(size) = hv; values(size) = v; size += 1
    compact()
  }

  def merge(other: LevelSampleBuffer): Unit = {
    if (other.level > level) {
      // prune this buffer to the other's (coarser) level first
      level = other.level
      val m = mask
      var w = 0
      var i = 0
      while (i < size) {
        if ((hashes(i) & m) == 0L) {
          hashes(w) = hashes(i); values(w) = values(i); w += 1
        }
        i += 1
      }
      size = w
    }
    var i = 0
    while (i < other.size) { add(other.hashes(i), other.values(i)); i += 1 }
  }
}

/** Deterministic mergeable quantile sketch as a `TypedImperativeAggregate`.
  *
  * Output: `struct<level:int, values:array<double>, hashes:array<long>>`
  * where `values` is the survivor sample SORTED ascending — the
  * q-quantile estimate is `values[ceil(q*m)]` (1-indexed, m = sample
  * size), each survivor standing for 2^level input rows — and `hashes`
  * carries each survivor's draw in the same (value, hash) sort order, so
  * a PERSISTED sketch can be re-merged with later batches (the append
  * path needs the hashes to re-apply coarser masks). When the group
  * holds at most `b` rows the level is 0 and the quantiles are EXACT.
  *
  * Inputs: `hash` — a 40-bit deterministic draw over the ROW identity
  * (duplicated values with distinct ids are sampled independently, so
  * multiplicity is preserved); `value` — the measured quantity. NULL in
  * either is skipped.
  */
case class LevelSample(
    hash: Expression,
    value: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LevelSampleBuffer] {

  require(b >= 2, "buffer size must be >= 2")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): LevelSampleBuffer =
    new LevelSampleBuffer(b)

  override def update(buf: LevelSampleBuffer, input: InternalRow): LevelSampleBuffer = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) buf.add(h.asInstanceOf[Long], d)
    }
    buf
  }

  override def merge(buf: LevelSampleBuffer, other: LevelSampleBuffer): LevelSampleBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: LevelSampleBuffer): Any = {
    // sort (value, hash) pairs by value (hash tie-break for determinism);
    // parallel arrays keep element_at(values, rank) semantics unchanged
    val pairs = Array.tabulate(buf.size)(i => (buf.values(i), buf.hashes(i)))
      .sortBy(identity)
    new GenericInternalRow(Array[Any](buf.level,
      new GenericArrayData(pairs.map(_._1: Any)),
      new GenericArrayData(pairs.map(_._2: Any))))
  }

  override def serialize(buf: LevelSampleBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + buf.size * 16)
    bb.putInt(buf.level).putInt(buf.size).putInt(buf.b)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hashes(i)).putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LevelSampleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val lev = bb.getInt(); val n = bb.getInt(); val cap = bb.getInt()
    val buf = new LevelSampleBuffer(cap)
    buf.level = lev
    buf.hashes = new Array[Long](math.max(n, 1))
    buf.values = new Array[Double](math.max(n, 1))
    var i = 0
    while (i < n) {
      buf.hashes(i) = bb.getLong(); buf.values(i) = bb.getDouble(); i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LevelSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LevelSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hash = c(0), value = c(1))
}

object LevelSample {
  /** Aggregate column: `struct<level, values>` — the deterministic
    * level-sample quantile sketch. */
  def level_sample(hash: Column, value: Column, b: Int): Column =
    ExpressionUtils.column(LevelSample(
      ExpressionUtils.expression(hash),
      ExpressionUtils.expression(value), b).toAggregateExpression())
}
