package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Automated sweep of every registered query's physical plan — the
  * machine-checked core of the PLANS.md hand audits: no query may plan
  * a CartesianProduct (an all-pairs join that survives to execution is
  * exactly the shape that detonates at 100 TB). Broadcast nested-loop
  * joins against scalar/k-row frames are the accepted pattern and plan
  * differently, so they pass untouched.
  *
  * Queries whose PAIR ALGEBRA is deliberately quadratic at test scale
  * (declared verification legs) still must not use CartesianProduct —
  * they are spelled as key joins; an empty whitelist is the point.
  */
class PlanAuditSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, Sf)
        val bad = df.queryExecution.executedPlan.collect {
          case c: CartesianProductExec => c
        }
        if (bad.nonEmpty) offenders += name
      } catch {
        case e: Throwable => offenders += s"$name (failed to plan: ${e.getMessage.take(80)})"
      }
    }
    assert(offenders.isEmpty,
      s"queries with CartesianProduct or plan failures: ${offenders.mkString(", ")}")
  }
}
