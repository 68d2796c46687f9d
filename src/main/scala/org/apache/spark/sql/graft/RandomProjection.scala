package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: Johnson–Lindenstrauss random projection —
  * `array<double>` of `dims` components down to `k` components, each
  * output j the scaled dot product with a pseudo-random direction.
  *
  * Directions reuse [[HyperplaneSignature]]'s md5-derived weight scheme —
  * w(seed, j, i) = `parse40(md5("seed:j:i")) % 100000 / 50000.0 − 1.0`,
  * uniform in [−1, 1) — so the projection is deterministic, layout-
  * independent, and an external SQL oracle rebuilds the identical matrix
  * (the q30-established replay). Outputs are scaled by √(3/k): uniform
  * [−1, 1) entries have variance 1/3, so the scale makes the projection
  * norm-preserving in expectation (E‖p‖² = ‖v‖²), the JL contract.
  *
  * Weights are computed once per executor and the per-row work is a tight
  * k×d primitive loop in a JIT-compiled method, invoked from whole-stage
  * codegen via a reference object (the weightsFor pattern).
  */
case class RandomProjection(child: Expression, k: Int, seed: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private var cachedWeights: Array[Array[Double]] = _
  @transient private lazy val scale: Double = math.sqrt(3.0 / k)

  /** Weight rows [k][dim]; pure function of (seed, j, i) — a prefix read
    * of a wider matrix is identical to a narrower one (benign race as in
    * HyperplaneSignature). Public: called from generated code. */
  def weightsFor(dim: Int): Array[Array[Double]] = {
    var w = cachedWeights
    if (w == null || w(0).length < dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      w = Array.tabulate(k, dim) { (j, i) =>
        val d = md.digest(s"$seed:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (Md5Hash.h40(d, 0) % 100000L) / 50000.0 - 1.0
      }
      cachedWeights = w
    }
    w
  }

  /** The full projection for one vector — shared by interpreted eval and
    * generated code (one virtual call per row; the k×d loop JITs here). */
  def project(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val w = weightsFor(n)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val wj = w(j)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += input.getDouble(i) * wj(i)
        i += 1
      }
      out(j) = s * scale
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("randomProj", this, classOf[RandomProjection].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.project($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProjection {
  /** Column API: `random_project(vec, k, seed)`. */
  def random_project(vec: Column, k: Int, seed: String): Column =
    ExpressionUtils.column(RandomProjection(ExpressionUtils.expression(vec), k, seed))
}
