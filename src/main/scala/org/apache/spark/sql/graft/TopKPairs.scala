package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Size-bounded top-k buffer of (score, id) pairs, kept sorted
  * best-to-worst. Order: higher score wins; ties broken by smaller id —
  * matching `row_number() over (order by score desc, id asc)`.
  *
  * With `dedup = true` an incoming pair already held in the buffer is
  * skipped — the buffer then holds the top-k DISTINCT pairs, which lets
  * a caller like the KMV sketch feed raw (possibly massively duplicated)
  * hashes straight into the partial aggregate instead of paying a
  * separate distinct shuffle first. */
final class TopKBuffer(val k: Int, val dedup: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def add(s: Double, id: Long): Unit = {
    // NaN scores (e.g. cosine of a zero vector) are dropped: a NaN at the
    // tail could never be displaced (all comparisons false), which would
    // block better finite candidates nondeterministically.
    if (java.lang.Double.isNaN(s)) return
    if (size == k && !beats(s, id, size - 1)) return
    if (dedup) {
      // locate the slot (s, id) would occupy; an exact match sits just
      // above it — `beats` is false on equality, so the scan stops there
      var j = if (size == k) size - 1 else size
      while (j > 0 && beats(s, id, j - 1)) j -= 1
      if (j > 0 && scores(j - 1) == s && ids(j - 1) == id) return
    }
    // find insert position (linear from the tail; k is small)
    var pos = if (size == k) size - 1 else size
    if (size < k) size += 1
    while (pos > 0 && beats(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** Top-k (score, id) pairs per group as a `TypedImperativeAggregate` —
  * the scale-correct alternative to `row_number()` windows for per-group
  * top-k: partial buffers combine map-side, so only k rows per group per
  * partition reach the shuffle instead of every candidate row.
  *
  * Output: `array<struct<neighbor_id:bigint, score:double>>`, best first,
  * with the same deterministic tie-break as the window formulation
  * (score desc, id asc).
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    dedup: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, dedup)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    // merge() only ever meets already-deduplicated buffers, but the flag
    // is still carried so a merge target keeps skipping duplicates
    val buf = new TopKBuffer(bb.getInt(), dedup)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKPairs {
  /** Aggregate column: top-k (score, id) pairs, best first. */
  def top_k_pairs(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKPairs(
      ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k).toAggregateExpression())

  /** Aggregate column: top-k DISTINCT (score, id) pairs, best first —
    * duplicates are dropped inside the partial buffers, so callers never
    * need a separate distinct pass (and its shuffle) ahead of the
    * aggregate. */
  def top_k_pairs_distinct(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKPairs(
      ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k, dedup = true).toAggregateExpression())
}
