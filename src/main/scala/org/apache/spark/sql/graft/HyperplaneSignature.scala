package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: random-hyperplane LSH signature — `nBits`
  * sign bits of hash-derived pseudo-random projections, packed into a long.
  *
  * Bit-identical to the higher-order formulation in
  * [[graft.functions.VectorFunctions]] history (weights are
  * `pmod(xxhash64(seed, bit, dim), 100000)/50000 − 1`, i.e. the XXH64 chain
  * `hashInt(dim, hashInt(bit, hashLong(seed, 42)))` Spark's `xxhash64`
  * computes over a (long, int, int) argument list), but runs as a tight
  * primitive loop inside whole-stage codegen instead of nBits × dim
  * interpreted lambda evaluations (~6 µs/eval) — this sits on the per-row
  * hot path of every embedding-LSH bucketing
  * ([[graft.operators.Similarity]]).
  */
case class HyperplaneSignature(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val seedH = XXH64.hashLong(seed, 42L)
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val bitH = XXH64.hashInt(j, seedH)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(i, bitH)
        val w = (((h % 100000L) + 100000L) % 100000L) / 50000.0 - 1.0
        proj += v.getDouble(i) * w
        i += 1
      }
      if (proj >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = classOf[XXH64].getName
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val proj = ctx.freshName("proj")
      val bitH = ctx.freshName("bitH")
      val h = ctx.freshName("h")
      val seedH = ctx.freshName("seedH")
      s"""
         |int $n = $v.numElements();
         |long $seedH = $xxh.hashLong(${seed}L, 42L);
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  long $bitH = $xxh.hashInt($j, $seedH);
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $xxh.hashInt($i, $bitH);
         |    $proj += $v.getDouble($i) * (((($h % 100000L) + 100000L) % 100000L) / 50000.0 - 1.0);
         |  }
         |  if ($proj >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
