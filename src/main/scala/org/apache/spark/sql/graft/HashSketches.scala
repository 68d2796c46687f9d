package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** md5-derived hash helpers shared by the sketch expressions below.
  *
  * The sketch hash families are deliberately built from md5 — not xxh64 —
  * so every signature is replayable in plain SQL by an external engine
  * (DuckDB: `CAST('0x' || substring(md5(s), 1, 10) AS BIGINT)`), making the
  * whole LSH result oracle-checkable, the same determinism trick as
  * [[graft.operators.Similarity.ivfTopK]]'s centroid sampling. md5 runs
  * once per shingle/token; the k-way fan-out on top is integer arithmetic.
  */
private[graft] object Md5Hash {
  val threadMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian 40-bit unsigned int from digest bytes [off, off+5) — the
    * value SQL gets from parsing 10 hex chars of the md5 string. */
  def h40(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 32) | ((d(off + 1) & 0xffL) << 24) |
      ((d(off + 2) & 0xffL) << 16) | ((d(off + 3) & 0xffL) << 8) | (d(off + 4) & 0xffL)

  /** 60-bit unsigned int from the digest's FIRST 15 HEX CHARS — bytes 0–6
    * whole plus the high nibble of byte 7: exactly
    * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)` in SQL. */
  def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** The Mersenne prime 2⁶¹−1 — modulus of the MinHash affine family. */
  val M61: Long = (1L << 61) - 1

  /** (a·v + b) mod 2⁶¹−1 for 0 ≤ a, v, b < 2⁶¹. Exact over the 122-bit
    * product via 2⁶¹ ≡ 1 (mod M61): fold the high/low 61-bit halves.
    * SQL replays it with 128-bit arithmetic:
    * `(CAST(a AS HUGEINT) * v + b) % 2305843009213693951`. */
  def affineModM61(a: Long, v: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, v)
    val lo = a * v
    var t = (lo & M61) + ((hi << 3) | (lo >>> 61))
    while (t >= M61) t -= M61
    t += b
    while (t >= M61) t -= M61
    t
  }

  /** 60-bit affine constant for hash family member `i` — the same value
    * SQL derives with `CAST('0x' || substring(md5('mh:' || kind || ':' ||
    * i), 1, 15) AS BIGINT)`. */
  def familyConst(kind: String, i: Int): Long = {
    val md = threadMd5.get()
    md.reset()
    h60(md.digest(s"mh:$kind:$i".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
  }
}

/** Native MinHash signature over word n-gram shingles, fused: for each
  * contiguous `n`-token window (joined by a single space — the same shingle
  * string an external oracle forms with `array_to_string(list_slice(t, i,
  * i+n-1), ' ')`), one md5 yields the shingle's 60-bit value v (its first
  * 15 hex chars); hash family i (1 ≤ i ≤ numHashes) is the affine map
  * (aᵢ·v + bᵢ) mod 2⁶¹−1 with aᵢ/bᵢ themselves md5-derived (60 bits of
  * md5("mh:a:i") / md5("mh:b:i")). Output slot i−1 is the minimum over all
  * windows; empty array when the doc has fewer than `n` tokens.
  *
  * Per-position INDEPENDENT multipliers matter: the earlier h1 + i·h2
  * double-hashing chain let one shingle win every position (the orderings
  * for all i collapse to the h2 ordering), making est-Jaccard bimodal —
  * a true-0.8 pair could estimate near 0 and be missed. Affine maps with
  * distinct aᵢ re-shuffle the ordering per position, restoring the
  * P(agree) = J estimator MinHash is built on, while every value remains
  * exactly replayable in SQL (60-bit operands, 2⁶¹−1 modulus → 128-bit
  * SQL arithmetic: `(CAST(a AS HUGEINT) * v + b) % 2305843009213693951`).
  *
  * Fusing shingling + minhash means no shingle strings are ever
  * materialized: the md5 is fed token bytes + separator directly. Values
  * stay < 2⁶¹, so BIGINT-safe in any oracle. Duplicate windows are
  * harmless (min over a multiset).
  *
  * Evaluation is `CodegenFallback` deliberately: the cost is inside this
  * compiled loop, so whole-stage codegen would add nothing.
  */
case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = Array(' '.toByte)

  // affine family constants, identical to the oracle's md5 derivation;
  // computed once per expression instance (row-independent)
  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(k => Md5Hash.familyConst("a", k + 1))
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(k => Md5Hash.familyConst("b", k + 1))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = Array.fill(numHashes)(Long.MaxValue)
    val md = Md5Hash.threadMd5.get()
    var i = 0
    while (i <= len - n) {
      md.reset()
      var j = i
      while (j < i + n) {
        if (j > i) md.update(space)
        if (!arr.isNullAt(j)) md.update(arr.getUTF8String(j).getBytes)
        j += 1
      }
      val sv = Md5Hash.h60(md.digest())
      var k = 0
      while (k < numHashes) {
        val h = Md5Hash.affineModM61(as(k), sv, bs(k))
        if (h < out(k)) out(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native 64-bit SimHash over an `array<string>` token set: each token's
  * md5 supplies 64 vote bits (bit b = bit (b mod 4) of hex digit ⌊b/4⌋ —
  * i.e. `(CAST('0x' || substring(md5(t), 1 + b//4, 1) AS INT) >> (b % 4)) &
  * 1` in SQL, so signatures are oracle-replayable); tokens vote ±1 per bit
  * and the sign of each vote sets the output bit. Same tight-loop rationale
  * as [[MinHashSignature]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val md = Md5Hash.threadMd5.get()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(j).getBytes)
        var b = 0
        while (b < 64) {
          // hex digit ⌊b/4⌋ of the digest string; bit (b%4) of that digit
          val byteIdx = b >> 3
          val digit = if ((b & 4) == 0) (d(byteIdx) >> 4) & 0xF else d(byteIdx) & 0xF
          if (((digit >> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
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

/** Native winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
  * over an `array<string>` of tokens: hash every `k`-token shingle to its
  * md5-derived 60-bit value (the [[Md5Hash.h60]] family — bit-identical to
  * `CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)`, so the whole
  * chain stays SQL-replayable), then keep the MINIMUM hash of each
  * length-`w` shingle window, distinct in first-occurrence order (exactly
  * `array_distinct(transform(sequence(...), i → array_min(slice(hs, i,
  * w))))`).
  *
  * Replaces that interpreted chain — per-shingle md5 through a lambda plus
  * a per-window `slice` COPY + `array_min` lambda, the dominant first-pass
  * cost of the winnowing query — with one compiled pass per row: each
  * shingle is hashed once, and the window minimum is a primitive scan over
  * a reused longs buffer. Fewer-than-`w` shingles → empty (no window
  * exists), matching the declarative guard.
  *
  * `CodegenFallback` deliberately, like every sketch here: the cost lives
  * inside this compiled loop.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = Array(' '.toByte)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val nShingles = len - k + 1
    if (nShingles < w) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nShingles)
    val md = Md5Hash.threadMd5.get()
    var i = 0
    while (i < nShingles) {
      md.reset()
      var j = i
      while (j < i + k) {
        if (j > i) md.update(space)
        if (!arr.isNullAt(j)) md.update(arr.getUTF8String(j).getBytes)
        j += 1
      }
      hs(i) = Md5Hash.h60(md.digest())
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nShingles - w) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
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

  def minhash_signature(tokens: Column, n: Int, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(tokens), n, numHashes))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))

  def winnowed_fingerprints(tokens: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowedFingerprints(ExpressionUtils.expression(tokens), k, w))
}
