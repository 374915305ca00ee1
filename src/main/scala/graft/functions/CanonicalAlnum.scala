package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for the canonical-text normalization the dedup
  * fingerprint uses: lowercase, then keep only ASCII `[a-z0-9]` —
  * exactly `regexp_replace(lower(s), "[^a-z0-9]", "")`, but as one tight
  * byte pass instead of a java.util.regex scan (the regex was the single
  * largest cost in the fingerprint queries: ~1.8 s of the 3.4 s at
  * sf0.1).
  *
  * Byte-level filtering is equivalent to the code-point regex here
  * because every kept character is single-byte ASCII and every byte of a
  * multi-byte UTF-8 character is >= 0x80 (so multi-byte characters are
  * dropped whole, never split).
  */
case class CanonicalAlnum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canonical_alnum expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    CanonicalAlnum.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CanonicalAlnum.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.canonicalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalAlnum =
    copy(child = newChild)

  override def prettyName: String = "canonical_alnum"
}

object CanonicalAlnum {

  /** Shared by eval and generated code: lowercase (Spark's own UTF8String
    * semantics, identical to `lower()`), then one pass keeping ASCII
    * alphanumerics.
    */
  def canonicalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bytes = s.toLowerCase.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(n) = b
        n += 1
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}
