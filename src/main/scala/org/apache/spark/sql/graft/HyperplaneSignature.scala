package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: random-hyperplane LSH signature — `nBits`
  * sign bits of hash-derived pseudo-random projections, packed into a long.
  *
  * Hyperplane weights are md5-derived: w(seed, bit j, dim i) =
  * `parse40(md5("seed:j:i")) % 100000 / 50000.0 − 1.0`, where `parse40`
  * takes the first 10 hex chars as an integer. The weights depend only on
  * (seed, j, i) — NOT on the row — so they are computed once per executor
  * (lazily, grown to the widest vector seen) and the per-row hot loop is a
  * pure primitive dot product inside whole-stage codegen. md5 (not xxh64)
  * so an external SQL oracle can rebuild the identical weight matrix
  * (`CAST('0x' || substring(md5(seed || ':' || j || ':' || i), 1, 10) AS
  * BIGINT) % 100000 / 50000.0 - 1.0`) and replay every bucket — the same
  * determinism trick as [[graft.operators.Similarity.ivfTopK]]'s centroid
  * sampling, extended to the LSH paths.
  */
case class HyperplaneSignature(child: Expression, nBits: Int, seed: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // Executor-local weight matrix [nBits][dims], grown on demand; weight
  // (j, i) is a pure function of (seed, j, i) so a prefix read of a wider
  // matrix is identical to a narrower one. Benign race: two threads may
  // build the same matrix, last-write-wins with equal contents.
  @transient private var cachedWeights: Array[Array[Double]] = _

  /** Weights for vectors of `dim` dimensions (invoked from interpreted eval
    * AND generated code — must stay public for codegen). */
  def weightsFor(dim: Int): Array[Array[Double]] = {
    var w = cachedWeights
    if (w == null || w(0).length < dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      w = Array.tabulate(nBits, dim) { (j, i) =>
        val d = md.digest(s"$seed:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (Md5Hash.h40(d, 0) % 100000L) / 50000.0 - 1.0
      }
      cachedWeights = w
    }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val w = weightsFor(n)
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val wj = w(j)
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += v.getDouble(i) * wj(i)
        i += 1
      }
      if (proj >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val proj = ctx.freshName("proj")
      val w = ctx.freshName("w")
      val wj = ctx.freshName("wj")
      s"""
         |int $n = $v.numElements();
         |double[][] $w = $self.weightsFor($n);
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double[] $wj = $w[$j];
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += $v.getDouble($i) * $wj[$i];
         |  }
         |  if ($proj >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: margin-aware MULTIPROBE hyperplane buckets
  * (Lv et al., VLDB 2007) — the exact [[HyperplaneSignature]] bucket plus
  * the `nFlips` buckets obtained by flipping, one at a time, the sign bits
  * whose projections have the SMALLEST magnitude (a near-zero projection
  * means the vector sits close to that hyperplane, so its true neighbours
  * plausibly landed just on the other side). Probing T+1 buckets per table
  * buys roughly the recall of (T+1)× as many single-probe tables while the
  * CORPUS is stored and banded only once per table — at scale the stored/
  * shuffled state is the cost, and multiprobe moves the multiplier from
  * the corpus side to the (cheap) query side.
  *
  * Same md5-derived weight family as [[HyperplaneSignature]], so every
  * probe is replayable in plain SQL (projections → order by (|proj|, bit)
  * → xor the flipped bit). Output: `array<long>` of length nFlips+1, the
  * exact bucket first, then flips in increasing-margin order. */
case class HyperplaneProbes(child: Expression, nBits: Int, seed: String, nFlips: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")
  require(nFlips >= 0 && nFlips < nBits, s"nFlips must be in [0, $nBits), got $nFlips")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private var cachedWeights: Array[Array[Double]] = _

  private def weightsFor(dim: Int): Array[Array[Double]] = {
    var w = cachedWeights
    if (w == null || w(0).length < dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      w = Array.tabulate(nBits, dim) { (j, i) =>
        val d = md.digest(s"$seed:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (Md5Hash.h40(d, 0) % 100000L) / 50000.0 - 1.0
      }
      cachedWeights = w
    }
    w
  }

  /** Public for generated code. */
  def probesFor(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val w = weightsFor(n)
    val proj = new Array[Double](nBits)
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val wj = w(j)
      var p = 0.0
      var i = 0
      while (i < n) { p += input.getDouble(i) * wj(i); i += 1 }
      proj(j) = p
      if (p >= 0) sig |= (1L << j)
      j += 1
    }
    // bits in increasing (|proj|, bit) order — deterministic, replayable
    val order = Array.tabulate(nBits)(identity)
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(math.abs(proj(a)), math.abs(proj(b)))
      if (c != 0) c else Integer.compare(a, b)
    })
    val out = new Array[Long](nFlips + 1)
    out(0) = sig
    var f = 0
    while (f < nFlips) { out(f + 1) = sig ^ (1L << boxed(f).intValue()); f += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    probesFor(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneProbes", this, classOf[HyperplaneProbes].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $self.probesFor($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
