package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native generator: one row `(pos, ghash)` per `n`-token window of a
  * text column — the hashed sibling of [[WordNGrams]], for lanes whose
  * window joins don't need the window TEXT, only its identity (the
  * streaming exact-substring scrub's standing-set membership, x172).
  *
  * Why hashes: the relational spelling materializes every window as a
  * `concat_ws` STRING (~L x token bytes per position — ~25x the payload
  * of a long) and shuffles those strings through the dup-set join; this
  * emits an 8-byte identity per window in ONE pass, with no string
  * allocation and no window Exchange (adjacency comes from the input
  * string itself, the [[WordNGrams]] argument).
  *
  * Hash definition (Spark-side only — no oracle twin ever sees it):
  * each token is XXH64 over its UTF-8 bytes (seed 42), and the window
  * hash chains those with `XXH64.hashLong(tokenHash, acc)` from
  * `acc = n`. Equal windows always hash equal (the scrub's coverage can
  * never miss); DISTINCT windows collide with probability ~2^-64 per
  * pair — ~1e-8 expected spurious covered windows at the 100x corpus's
  * ~10^8 distinct windows, the same odds class the lane's own docs
  * accept for xxhash64'd grams at 100 TB. Tokenization is
  * [[WordNGrams.tokens]], identical to `TextAnalysis.wsTokens` (the
  * caller lowercases upstream, as with WordNGrams).
  */
case class HashedWindows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "window size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_windows expects STRING, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    StructType(Seq(StructField("pos", LongType, nullable = false),
      StructField("ghash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val tokens = WordNGrams.tokens(v.asInstanceOf[UTF8String])
    if (tokens.length < n) return Iterator.empty
    // hash each token once; each window then chains n longs
    val th = new Array[Long](tokens.length)
    var j = 0
    while (j < tokens.length) {
      val b = tokens(j).getBytes(StandardCharsets.UTF_8)
      th(j) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      j += 1
    }
    Iterator.range(0, tokens.length - n + 1).map { i =>
      var h = n.toLong
      var k = i
      while (k < i + n) { h = XXH64.hashLong(th(k), h); k += 1 }
      InternalRow(i.toLong, h)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWindows =
    copy(child = newChild)

  override def prettyName: String = "hashed_windows"
}
