package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding application (Sennrich et al. 2016, arXiv 1508.07909)
  * as native expressions: the TRAINED merge list rides inside the
  * expression (driver-side literal, serialized once per task like
  * [[SetHits]]' word sets), and each row is encoded in one compiled pass —
  * pre-tokenize to lowercase ASCII word runs, then apply merges in rank
  * order with the reference's greedy scan.
  *
  * Merge-scan semantics (the SQL-parity contract): one left-to-right pass
  * per merge; after a pair merges, scanning continues AFTER the merged
  * symbol (`i = j + 2` in the reference implementation). On the oracle's
  * `(a)(b)(c)` delimited-string representation this is EXACTLY what a
  * non-overlapping left-to-right `replace('(a)(b)' -> '(ab)')` computes —
  * adjacent matches share no characters in that representation — so the
  * DuckDB replay is equal by construction, not by approximation
  * (BpeSpec pins the equivalence against Spark's own `replace`).
  *
  * Evaluation is `CodegenFallback` deliberately, like [[MinHashSignature]]:
  * the cost is inside this loop, not in the virtual-call boundary. */
object BpeMerges {

  /** Apply `merges` (rank order) to one word's character symbols. */
  private[graft] def applyMerges(
      word: Array[String], merges: Array[(String, String)]): Array[String] = {
    var syms = word
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val (a, b) = merges(m)
      var found = false
      var i = 0
      while (!found && i < syms.length - 1) {
        found = syms(i) == a && syms(i + 1) == b
        i += 1
      }
      if (found) {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b
            j += 2 // reference semantics: continue AFTER the merged symbol
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.result()
      }
      m += 1
    }
    syms
  }

  /** Lowercase-ASCII word runs of an (already lowercased) string — the
    * `regexp_extract_all(lower(text), '[a-z]+')` pre-tokenizer, scanned
    * natively. */
  private[graft] def wordRuns(s: UTF8String): Iterator[String] = {
    val str = s.toString
    new Iterator[String] {
      private var i = 0
      private def skip(): Unit = { while (i < str.length && !isAz(str.charAt(i))) i += 1 }
      private def isAz(c: Char) = c >= 'a' && c <= 'z'
      skip()
      def hasNext: Boolean = i < str.length
      def next(): String = {
        val start = i
        while (i < str.length && isAz(str.charAt(i))) i += 1
        val w = str.substring(start, i)
        skip()
        w
      }
    }
  }
}

/** Token count of a text under a trained BPE merge list: pre-tokenize
  * `lower(text)` to `[a-z]+` runs, encode each word, count symbols.
  * Input must already be lowercased (compose as `bpe_token_count(lower(c))`)
  * so case folding stays Spark's own — one fewer parity surface. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any = {
    var n = 0
    val it = BpeMerges.wordRuns(v.asInstanceOf[UTF8String])
    while (it.hasNext) {
      val w = it.next()
      n += BpeMerges.applyMerges(w.map(_.toString).toArray, mergeArr).length
    }
    n
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Full token sequence (array<string>) of a text under a merge list — the
  * spec/debug sibling of [[BpeTokenCount]]; same pre-tokenizer, same scan. */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any = {
    val out = Array.newBuilder[UTF8String]
    val it = BpeMerges.wordRuns(v.asInstanceOf[UTF8String])
    while (it.hasNext) {
      val w = it.next()
      BpeMerges.applyMerges(w.map(_.toString).toArray, mergeArr)
        .foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeTokenCount {
  def bpe_token_count(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokenCount(ExpressionUtils.expression(c), merges))
  def bpe_tokens(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokens(ExpressionUtils.expression(c), merges))
}
