package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `point` column (F3):
  * parses the Postgres text form `"(lon,lat)"` into
  * `struct<lon double, lat double>`, NULL on malformed input.
  *
  * This is the (b) tier of the custom-operator ladder (built-ins ->
  * custom Expression -> custom plan): one pass over the UTF8 bytes
  * instead of the two regexp_extract + two casts the built-in spelling
  * needs, and it participates in whole-stage codegen via `doGenCode`
  * (the generated code calls the shared static parser — the same
  * pattern Spark's own `StaticInvoke`-backed expressions use, keeping
  * eval and codegen semantics identical by construction).
  */
case class ParsePoint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_point expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType), StructField("lat", DoubleType)))

  // malformed text yields NULL even for a non-null input
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ParsePoint.parseOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ParsePoint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val result = ctx.freshName("point")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |InternalRow $result = $helper.parseOrNull($c);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ParsePoint =
    copy(child = newChild)

  override def prettyName: String = "parse_point"
}

object ParsePoint {

  /** Shared parser for both eval and generated code. Strict shape:
    * `(<double>,<double>)`, no surrounding garbage.
    */
  def parseOrNull(s: UTF8String): InternalRow = {
    if (s == null) return null
    val str = s.toString
    if (str.length < 5 || str.charAt(0) != '(' || str.charAt(str.length - 1) != ')') return null
    val comma = str.indexOf(',')
    if (comma < 2 || comma >= str.length - 2) return null
    try {
      val lon = java.lang.Double.parseDouble(str.substring(1, comma))
      val lat = java.lang.Double.parseDouble(str.substring(comma + 1, str.length - 1))
      new GenericInternalRow(Array[Any](lon, lat))
    } catch {
      case _: NumberFormatException => null
    }
  }

  /** Register `parse_point` in a session's function registry (idempotent)
    * so `expr("parse_point(...)")` and SQL can use it.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parse_point"),
      new ExpressionInfo(classOf[ParsePoint].getName, "parse_point"),
      (children: Seq[Expression]) => ParsePoint(children.head))
}
