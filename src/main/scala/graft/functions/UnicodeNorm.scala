package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization for text-pipeline cleaning — the step
  * every multi-source corpus needs before dedup/hashing (the same
  * logical document arrives as precomposed "é" from one crawler and
  * "e"+U+0301 from another; every downstream fingerprint, shingle and
  * exact-dedup hash disagrees until the code points are canonical).
  * Native Catalyst expression (not a UDF): evaluates on the internal
  * row format and stays inside whole-stage codegen via a static call.
  */
object UnicodeNorm {
  /** NFC-normalize; the `isNormalized` quick check makes the common
    * (ASCII / already-canonical) row a zero-allocation pass-through —
    * only rows that actually need recomposition pay the conversion. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` — Unicode canonical composition (NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.UnicodeNorm.nfc($a);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
