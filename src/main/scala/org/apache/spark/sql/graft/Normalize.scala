package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization — the one step of
  * text cleaning `org.apache.spark.sql.functions` has no primitive for.
  * Visually identical strings with different codepoint sequences (é as
  * U+00E9 vs e + combining U+0301) hash differently, so every
  * fingerprint-keyed operator in the engine (exact dedup, paragraph dedup,
  * span removal, decontamination) silently treats them as distinct until
  * the corpus is normalized.
  *
  * Semantics are the Unicode standard's — `java.text.Normalizer` here,
  * `nfc_normalize` in DuckDB — so the oracle replays the cleaning chain
  * exactly. ASCII (and any already-composed text) takes the `isNormalized`
  * fast path: one scan, zero allocation, which at 100 TB is the common
  * case that matters.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Normalize {
  def nfc_normalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
}
