package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonicalization a
  * multilingual corpus needs BEFORE any hash-keyed operation (exact
  * dedup x10, fingerprints x04, chunk hashes x52/x116): "é" spelled as
  * U+00E9 and as "e"+U+0301 are the same text to a reader but different
  * bytes to md5, so un-normalized corpora under-deduplicate and split
  * vocabulary entries. Spark has no built-in for this (DuckDB ships
  * `nfc_normalize`; the oracle uses it verbatim) — a one-expression
  * gap, filled the §2.8 way: a codegen'd `UnaryExpression` over the
  * JDK's own `java.text.Normalizer` (ICU-equivalent NFC tables, no
  * external dependency).
  *
  * Fast path: NFC-normalized text is the overwhelming common case (all
  * ASCII is trivially NFC), and `Normalizer.isNormalized` is a cheap
  * scan that avoids allocating for it — the same
  * check-before-transform trick production normalizers use. ASCII
  * round-trips byte-identically, so plugging this under existing hash
  * lanes changes nothing on an already-clean corpus.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Shared by eval and generated code. The isNormalized pre-check keeps
    * the common (already-NFC, e.g. ASCII) path allocation-free.
    */
  def normalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
