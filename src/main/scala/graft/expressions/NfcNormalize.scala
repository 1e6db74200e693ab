package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical first step of a pretraining
  * text pipeline: composed and decomposed encodings of the same text
  * ("é" vs "e"+U+0301) must hash, shingle, and dedup identically, so the
  * corpus is normalized ONCE at ingest and every downstream fingerprint
  * operates on canonical bytes.
  *
  * Native Catalyst expression with real `doGenCode` (a static call inside
  * whole-stage codegen — no UDF serialization, no interpreted-eval row
  * boundary). The ASCII fast path skips the Normalizer entirely: web-scale
  * English corpora are overwhelmingly ASCII, and `Normalizer.isNormalized`
  * is O(n) over chars with early exit, so already-NFC text (the common
  * case) costs one scan and zero allocation.
  *
  * Parity: DuckDB `nfc_normalize` implements the same UAX #15 NFC form,
  * which the `text_normalize` gate pins corpus-wide. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
