package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator (UDTF tier of the §2.8 extension surface): one row
  * per word n-gram of a text column, emitted in a single pass.
  *
  * The relational spelling of the same thing — posexplode the tokens,
  * shuffle-sort per document, `lead` the next two words back together —
  * pays a full window Exchange just to rebuild adjacency the input
  * string already had. A Generator keeps adjacency: one eval per ROW
  * yields the n-gram rows directly, zero shuffles. (CodegenFallback is
  * the standard cost for custom generators — the per-row call yields an
  * iterator, so there is no per-ELEMENT interpretation overhead.)
  *
  * Tokenization matches `TextAnalysis.wsTokens` exactly: split the
  * trimmed text on `\s+` (the caller lowercases upstream if wanted).
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects STRING, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val tokens = WordNGrams.tokens(v.asInstanceOf[UTF8String])
    if (tokens.length < n) Iterator.empty
    else Iterator.range(0, tokens.length - n + 1).map { i =>
      InternalRow(UTF8String.fromString(tokens.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {
  /** `split(trim(s), "\\s+")` with Java regex semantics — identical to
    * the relational `wsTokens` spelling (FunctionsSpec asserts it).
    */
  def tokens(s: UTF8String): Array[String] =
    s.toString.trim.split("\\s+")
}
