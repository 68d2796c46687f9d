package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Native MinHash signature: for each of `numHashes` hash functions
  * h_i(s) = xxh64(s, seed=i+1), the minimum over the input `array<long>`
  * of hashed shingles.
  *
  * The higher-order formulation (`transform(sequence(...), i ⇒
  * array_min(transform(shingles, s ⇒ xxhash64(s, i))))`) pays interpreted
  * lambda dispatch + boxing per hash eval — ~6 µs each, 100 s for a 5 k-doc
  * corpus. This expression runs the same k×|shingles| xxh64 computations in
  * a compiled primitive loop (milliseconds). Per-row, no shuffle; the LSH
  * banding downstream is unchanged.
  *
  * Evaluation is `CodegenFallback` deliberately: the cost is inside this
  * compiled loop, so whole-stage codegen would add nothing.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(arr.getLong(j), i + 1L)
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native 64-bit SimHash over an `array<string>` token set: each token's
  * xxh64 (seed 42, matching Spark's `xxhash64`) votes ±1 per bit; the sign
  * of each vote sets the output bit. Same tight-loop rationale as
  * [[MinHashSignature]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native distinct hashed word-shingles: from an `array<string>` of tokens,
  * the distinct xxh64 values of every contiguous `n`-token window (running
  * hash over the window's tokens). Replaces the interpreted
  * `array_distinct(transform(sequence(...), i ⇒ xxhash64(slice(t, i, n))))`
  * chain — one compiled pass per row. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      var h = 42L
      var j = i
      while (j < i + n) {
        h = if (arr.isNullAt(j)) XXH64.hashLong(0L, h)
            else XXH64.hashUTF8String(arr.getUTF8String(j), h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native one-pass token statistics over an `array<string>` column:
  * `struct<n_tokens:int, n_chars:bigint>`. Replaces an interpreted
  * `aggregate(tokens, 0L, acc + length(w))` lambda in the text-quality hot
  * path; the character count is the same `length()` semantics (code
  * points), so derived means are bit-identical. */
case class TokenStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var chars = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) chars += arr.getUTF8String(i).numChars()
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, chars))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native per-set token membership counts: for an `array<string>` of tokens
  * and `sets` literal word lists, returns `array<int>` where slot `i` is
  * the number of tokens (occurrences, not distinct) contained in set `i`.
  *
  * Replaces N interpreted `size(filter(toks, t ⇒ array_contains(set, t)))`
  * chains (the language-ID hot path: N languages × |tokens| lambda evals
  * per row) with ONE compiled pass — hash-set lookups per token. Counts
  * are identical to the lambda/`list_filter` formulation, so external
  * oracles are unaffected. */
case class SetHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val lookup: Array[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] =
    sets.map { ws =>
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](ws.size * 2)
      ws.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](lookup.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var s = 0
        while (s < lookup.length) {
          if (lookup(s).contains(t)) counts(s) += 1
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native argmax over [[SetHits]]-style counts: label of the set with the
  * most token hits (occurrence counts), FIRST label winning ties,
  * `fallback` when no set scores a hit. The whole vote — one pass over the
  * tokens, one hash lookup per (token, set) — runs per row in one compiled
  * call, vs. `labels.length` separate interpreted filter chains plus a
  * greatest/CASE tree re-evaluating them. */
case class ArgmaxSetHits(
    child: Expression,
    labels: Seq[String],
    sets: Seq[Seq[String]],
    fallback: String)
    extends UnaryExpression with CodegenFallback {

  require(labels.length == sets.length, "one label per word set")

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  @transient private lazy val lookup: Array[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] =
    sets.map { ws =>
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](ws.size * 2)
      ws.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      s
    }.toArray

  @transient private lazy val labelBytes: Array[org.apache.spark.unsafe.types.UTF8String] =
    labels.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  @transient private lazy val fallbackBytes: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(fallback)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](lookup.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var s = 0
        while (s < lookup.length) {
          if (lookup(s).contains(t)) counts(s) += 1
          s += 1
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var s = 0
    while (s < counts.length) {
      if (counts(s) > best) { best = counts(s); bestIdx = s } // first wins ties
      s += 1
    }
    if (bestIdx < 0) fallbackBytes else labelBytes(bestIdx)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashSketches {
  def token_stats(tokens: Column): Column =
    ExpressionUtils.column(TokenStats(ExpressionUtils.expression(tokens)))

  def set_hits(tokens: Column, sets: Seq[Seq[String]]): Column =
    ExpressionUtils.column(SetHits(ExpressionUtils.expression(tokens), sets))

  def argmax_set_hits(tokens: Column, labels: Seq[String],
      sets: Seq[Seq[String]], fallback: String): Column =
    ExpressionUtils.column(ArgmaxSetHits(
      ExpressionUtils.expression(tokens), labels, sets, fallback))

  def minhash_signature(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))
}
