package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. Spark 4 hides the classic converters
  * behind `private[sql]`, so libraries shipping native Catalyst
  * expressions host this two-liner inside the org.apache.spark.sql
  * namespace (the same approach public Spark extension libraries use) —
  * the ONLY thing that lives here; everything else stays in `graft`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
