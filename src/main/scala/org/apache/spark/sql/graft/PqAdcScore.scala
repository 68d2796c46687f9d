package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: PQ asymmetric-distance score of one
  * candidate pair — `Σ_sub dot(u[sub·subDim ‥ +subDim], cb[sub][code_sub])`
  * over the query's unit vector (`array<double>`) and the neighbor's code
  * array (`array<int>`, one code per subspace, ascending-sub order).
  *
  * The trained codebook is a constructor constant, flattened to
  * `double[m · nCodes · subDim]` and shipped once per task via the codegen
  * reference ledger — kilobytes, the expression-level analogue of a
  * broadcast dimension. The higher-order
  * `aggregate(sequence(...), slice/element_at ...)` formulation of the same
  * fold evaluates lambdas interpretively per (row × subspace) and was the
  * dominant stage cost of the IVF-PQ queries; this compiles to two nested
  * primitive loops inside whole-stage codegen.
  *
  * Summation order is bit-identical to the relational formulation the
  * DuckDB oracle replays: each subspace partial accumulates left-to-right
  * (exactly [[DotProduct]]'s loop over the sliced subvector), and partials
  * fold in ascending-sub order starting from 0.0.
  */
case class PqAdcScore(
    left: Expression,
    right: Expression,
    codebook: IndexedSeq[Double],
    nCodes: Int,
    subDim: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(nCodes >= 1 && subDim >= 1, s"nCodes/subDim must be >= 1, got $nCodes/$subDim")
  require(codebook.nonEmpty && codebook.length % (nCodes * subDim) == 0,
    s"codebook length ${codebook.length} is not a multiple of nCodes*subDim (${nCodes * subDim})")

  /** Subspace count implied by the codebook — every code array and unit
    * vector must agree with it; a drifted encoding fails loudly here
    * instead of silently reading the wrong codebook slot. */
  private val mCb: Int = codebook.length / (nCodes * subDim)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val cbArr: Array[Double] = codebook.toArray

  /** Row-shape guard shared by both eval paths (static so generated code
    * can call it). One branch per row + one per code — noise next to the
    * m×subDim multiply loop. */
  @inline private def checkShape(uLen: Int, m: Int, cs: ArrayData): Unit =
    PqAdcScore.validateShape(uLen, m, cs, mCb, nCodes, subDim)

  override def nullSafeEval(u: Any, codes: Any): Any = {
    val uv = u.asInstanceOf[ArrayData]
    val cs = codes.asInstanceOf[ArrayData]
    val m = cs.numElements()
    checkShape(uv.numElements(), m, cs)
    var score = 0.0
    var s = 0
    while (s < m) {
      val off = (s * nCodes + cs.getInt(s)) * subDim
      var p = 0.0
      var i = 0
      while (i < subDim) {
        p += uv.getDouble(s * subDim + i) * cbArr(off + i)
        i += 1
      }
      score += p
      s += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    val cls = PqAdcScore.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (u, codes) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val p = ctx.freshName("p")
      val score = ctx.freshName("score")
      s"""
         |int $m = $codes.numElements();
         |$cls.validateShape($u.numElements(), $m, $codes, $mCb, $nCodes, $subDim);
         |double $score = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $off = ($s * $nCodes + $codes.getInt($s)) * $subDim;
         |  double $p = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    $p += $u.getDouble($s * $subDim + $i) * $cbRef[$off + $i];
         |  }
         |  $score += $p;
         |}
         |${ev.value} = $score;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def pq_adc_score(u: Column, codes: Column, codebook: IndexedSeq[Double],
      nCodes: Int, subDim: Int): Column =
    ExpressionUtils.column(PqAdcScore(
      ExpressionUtils.expression(u), ExpressionUtils.expression(codes),
      codebook, nCodes, subDim))

  /** Row-shape guard for both the interpreted and generated eval paths: the
    * code array must have exactly the codebook's subspace count, the unit
    * vector m·subDim components, and every code must address a real
    * codebook row. Fails with the offending values instead of an
    * out-of-bounds read deep inside the fold. */
  def validateShape(uLen: Int, m: Int, codes: ArrayData,
      mCb: Int, nCodes: Int, subDim: Int): Unit = {
    if (m != mCb || uLen != m * subDim)
      throw new IllegalArgumentException(
        s"pq_adc_score shape mismatch: got $m codes and a $uLen-component " +
          s"unit vector, codebook expects $mCb codes over ${mCb * subDim} components")
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= nCodes)
        throw new IllegalArgumentException(
          s"pq_adc_score code out of range: code $c at subspace $s, codebook has $nCodes rows")
      s += 1
    }
  }
}
