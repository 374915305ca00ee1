package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ParsePoint

/** SparkSessionExtensions entry point: makes the library's native
  * expressions first-class SQL functions in any session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), so SQL users get
  * `parse_point(...)` without calling the registrar from code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectFunction((
      FunctionIdentifier("parse_point"),
      new ExpressionInfo(classOf[ParsePoint].getName, "parse_point"),
      (children: Seq[Expression]) => ParsePoint(children.head)))
}
