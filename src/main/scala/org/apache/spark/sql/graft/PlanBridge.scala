package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** LogicalPlan <-> DataFrame bridge (the [[ColumnBridge]] discipline for
  * whole plans): Spark 4 hides `Dataset.ofRows` and `logicalPlan` behind
  * `private[sql]`, so a library shipping a custom logical operator hosts
  * these three-liners inside the org.apache.spark.sql namespace. Nothing
  * else lives here.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add an extra planner strategy to the session (the
    * runtime-injection path; `GraftExtensions` covers the config-time
    * `injectPlannerStrategy` path).
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Runtime counterpart of `injectOptimizerRule`, with removal — a
    * caller can scope a rewrite to one materialization.
    */
  def ensureOptimizerRule(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ r
  }

  def removeOptimizerRule(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.extraOptimizations =
      cs.experimental.extraOptimizations.filterNot(_ eq r)
  }
}
