package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-only BPE-ish lexer: the number of matches of
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (letter runs, digit runs, single
  * non-space symbols) WITHOUT materializing the match array —
  * `size(regexp_extract_all(...))` builds every matched substring just to
  * count them, which dominated the token-count query. One byte pass,
  * same pattern as [[CanonicalAlnum]].
  *
  * Byte-level counting is equivalent to the code-point regex: the run
  * classes are pure ASCII, `\s` is pure ASCII, and every non-ASCII code
  * point (which the regex counts as ONE `[^A-Za-z0-9\s]` match) has
  * exactly one UTF-8 lead byte — continuation bytes are skipped, so
  * multi-byte characters count once, surrogate pairs included.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BpeTokenCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

object BpeTokenCount {

  /** Shared by eval and generated code. State machine over raw UTF-8
    * bytes: a letter/digit byte extends or opens its run; a Java-regex
    * whitespace byte (space \t \n \x0B \f \r) closes runs; any other
    * ASCII byte counts singly; a UTF-8 lead byte (>= 0xC0 unsigned, i.e.
    * not a continuation) counts singly; continuation bytes are skipped.
    */
  def count(s: UTF8String): Int = {
    if (s == null) return 0
    val bytes = s.getBytes
    var n = 0
    var run = 0 // 0 = none, 1 = letters, 2 = digits
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        if (run != 1) { n += 1; run = 1 }
      } else if (b >= '0' && b <= '9') {
        if (run != 2) { n += 1; run = 2 }
      } else {
        run = 0
        val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
        if (!ws && (b >= 0 || (b & 0xc0) != 0x80)) n += 1
      }
      i += 1
    }
    n
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (children: Seq[Expression]) => BpeTokenCount(children.head))
}
