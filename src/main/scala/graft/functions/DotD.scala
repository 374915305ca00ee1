package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native left-fold double dot product of two float arrays — the
  * codegen'd replacement for the `aggregate(zip_with(...))` spelling
  * that every cosine consumer (exact top-k, the ANN recall gates, the
  * banded near-dup verify leg, kNN eval) previously interpreted per
  * element: the HOF chain allocates a zipped array and evaluates two
  * lambdas per dimension per pair, which dominated the exact-scoring
  * legs at the 10x corpus.
  *
  * SEMANTICS ARE BIT-IDENTICAL to the HOF spelling and to the DuckDB
  * twins' `list_reduce(list_transform(...))`: a left fold from 0.0 over
  * float->double products in index order (0.0 + p1 == p1 exactly, so
  * the sum sequences agree), unequal lengths or a null element yield
  * NULL (zip_with pads with null, and null poisons the fold). Both
  * eval and codegen call the same static kernel, the ParsePoint
  * discipline that keeps interpreted and generated paths identical by
  * construction.
  */
case class DotD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_d expects ARRAY<FLOAT> args, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // unequal lengths / null elements yield NULL even for non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotD.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DotD.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val result = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $result = $helper.dotOrNull($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotD =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_d"
}

object DotD {

  /** The shared eval/codegen kernel: strict left fold in index order. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Shared SQL builder: arity-checked so `dot_d(x)` raises a proper
    * analysis-time error naming the function instead of an
    * IndexOutOfBoundsException from `children(1)`.
    */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"dot_d expects exactly 2 arguments (array<float>, array<float>), " +
        s"got ${children.length}")
    DotD(children.head, children(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotD].getName, "dot_d"),
      builder _)
}
