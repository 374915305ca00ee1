package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native quality-gate counters: ONE code-point scan of a text column
  * producing `struct<n_chars, n_tokens, n_punct, n_stop: bigint>` — the
  * four quantities the x02/x05/x89/x109 curation formulas share.
  *
  * The relational spelling paid three regex passes per document, one of
  * which (`regexp_extract_all('[^A-Za-z0-9\\s]')`) MATERIALIZES an
  * array holding every punctuation character as its own single-char
  * string just to take its size — measured 42 s for x02's single
  * projection over the 100x corpus (~500 MB of text at ~12 MB/s). The
  * scan reproduces the regex semantics exactly:
  *
  *   - n_chars = code points (Spark `length` counts code points);
  *   - whitespace = Java/RE2 `\s` = the six ASCII chars
  *     { space, \t, \n, , \f, \r } (neither engine uses Unicode
  *     classes here);
  *   - n_tokens = `split(trim(text), "\\s+")` semantics with Java's
  *     limit -1 (Spark's `StringSplit` default): maximal
  *     non-whitespace runs of the space-trimmed text, PLUS one empty
  *     token when the space-trimmed text starts with non-space
  *     whitespace (split emits a leading "") and one when it ends
  *     with non-space whitespace (limit -1 keeps the trailing "").
  *     Spark's `trim` strips ONLY ASCII spaces, so e.g.
  *     `"hello\n"` splits to ["hello", ""] = 2 tokens. An
  *     empty/all-space input yields ONE (empty-string) token —
  *     `"".split` returns [""], and DuckDB's string_split_regex
  *     agrees on all of the above;
  *   - n_punct = matches of `[^A-Za-z0-9\s]` over the UNtrimmed text:
  *     one per non-alnum non-ws code point (a supplementary code point
  *     is one match in both engines);
  *   - n_stop = tokens string-equal to a stoplist entry (each
  *     occurrence counts, matching `filter(tokens, isInCollection)`).
  */
case class QualityCounts(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_counts expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    QualityCounts.count(input.asInstanceOf[UTF8String], stopsArray)

  @transient private lazy val stopsArray: Array[String] = stops.toArray

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = QualityCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // Java SOURCE syntax, not the JVM binary name "[Ljava.lang.String;"
    // (the name is pasted into a cast in generated code; Janino cannot
    // compile the binary form and Spark would silently fall back to
    // interpreted eval)
    val stopsRef = ctx.addReferenceObj("stops", stopsArray,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.count($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityCounts =
    copy(child = newChild)

  override def prettyName: String = "quality_counts"
}

object QualityCounts {

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')

  /** Shared counter for eval and generated code. */
  def count(s: UTF8String, stops: Array[String]): InternalRow = {
    val str = s.toString
    var nChars = 0L
    var nPunct = 0L
    var nTokens = 0L
    var nStop = 0L
    var tokStart = -1
    var i = 0
    val len = str.length
    // split-limit-(-1) bookkeeping: Spark's trim strips ONLY ASCII
    // spaces, so the trimmed text can still begin/end with other
    // whitespace — split then emits a leading/trailing EMPTY token
    var seenNonSpace = false     // any code point != ' '
    var firstNonSpaceIsWs = false // trimmed text starts with \t\n\x0B\f\r
    var lastNonSpaceIsWs = false  // trimmed text ends with \t\n\x0B\f\r
    def closeToken(end: Int): Unit = {
      if (tokStart >= 0) {
        nTokens += 1
        var k = 0
        var hit = false
        while (k < stops.length && !hit) {
          val w = stops(k)
          if (end - tokStart == w.length && str.startsWith(w, tokStart)) hit = true
          k += 1
        }
        if (hit) nStop += 1
        tokStart = -1
      }
    }
    while (i < len) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (cp != ' ') {
        val ws = isWs(cp)
        if (!seenNonSpace) { seenNonSpace = true; firstNonSpaceIsWs = ws }
        lastNonSpaceIsWs = ws
      }
      if (isWs(cp)) closeToken(i)
      else {
        if (!isAlnum(cp)) nPunct += 1
        if (tokStart < 0) tokStart = i
      }
      i += Character.charCount(cp)
    }
    closeToken(len)
    val hasEmptyStop = stops.exists(_.isEmpty)
    if (!seenNonSpace) {
      // split(trim(""), "\\s+") = [""]: blank/all-space input still has
      // ONE token (the empty string)
      nTokens = 1L
      if (hasEmptyStop) nStop += 1
    } else {
      // "\thello" -> ["", "hello"]; "hello\n" -> ["hello", ""] (limit -1
      // keeps trailing empties). All-non-space-whitespace ("\t\n") gets
      // BOTH: ["", ""].
      if (firstNonSpaceIsWs) { nTokens += 1; if (hasEmptyStop) nStop += 1 }
      if (lastNonSpaceIsWs) { nTokens += 1; if (hasEmptyStop) nStop += 1 }
    }
    new GenericInternalRow(Array[Any](nChars, nTokens, nPunct, nStop))
  }
}
