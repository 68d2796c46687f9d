package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: Σ aᵢ·bᵢ over two `array<double>` columns.
  *
  * This is the hot-path scalar of every similarity operator (cosine top-k
  * scores O(n · candidates) of these per batch). The higher-order
  * `aggregate(zip_with(...))` formulation allocates an intermediate array
  * per pair and evaluates lambdas interpretively; this expression compiles
  * to a tight primitive loop inside whole-stage codegen. Summation order is
  * left-to-right, identical to the higher-order fold and to external
  * oracles' sequential loops, so results are bit-identical.
  *
  * (Lives in an `org.apache.spark.sql` subpackage because
  * `AbstractDataType`/`ExpressionUtils` are `private[sql]` — the standard
  * host package for third-party Catalyst expressions.)
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: number of positions where two equal-length
  * `array<long>` columns agree — the MinHash signature-agreement count
  * behind estimated Jaccard. Same hot-path rationale as [[DotProduct]]:
  * runs once per LSH candidate pair, and the higher-order
  * `aggregate(zip_with(...))` formulation pays interpreted lambda dispatch
  * per signature position. */
case class LongPositionsEqual(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType),
      ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $eq;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level access to graft's native expressions (bridges the
  * `private[sql]` Column ↔ Expression conversions). */
object NativeFunctions {
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplane_sig(v: Column, nBits: Int, seed: String): Column =
    ExpressionUtils.column(HyperplaneSignature(
      ExpressionUtils.expression(v), nBits, seed))

  def hyperplane_probes(v: Column, nBits: Int, seed: String, nFlips: Int): Column =
    ExpressionUtils.column(HyperplaneProbes(
      ExpressionUtils.expression(v), nBits, seed, nFlips))

  def long_positions_equal(a: Column, b: Column): Column =
    ExpressionUtils.column(LongPositionsEqual(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
