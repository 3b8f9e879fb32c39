package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization (L80): canonical composition of
  * combining sequences ("e" + U+0301 → "é"), the standard first step of
  * text curation — two byte-different encodings of the same visible
  * string otherwise defeat exact dedup, fingerprints and shingle
  * hashes. NFC only (canonical): compatibility foldings (ligatures,
  * width variants) are NFKC, a different — lossy — decision a pipeline
  * must opt into explicitly.
  *
  * Codegen'd with an `isNormalized` fast path that returns the INPUT
  * UTF8String untouched — on real corpora almost every document is
  * already NFC, so the hot path does zero allocation and zero copying.
  * Matches DuckDB `nfc_normalize` (utf8proc) for the oracle: both
  * implement Unicode canonical composition.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
