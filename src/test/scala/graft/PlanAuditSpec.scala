package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.{CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

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

  test("no un-pruned global window: every empty-partition Window sits above a local prune, aggregate, or limit") {
    // A Window with an empty partitionSpec is a single-reducer funnel;
    // it is acceptable ONLY over provably bounded input — below it
    // there must be a partitioned Window (the two-phase top-k local
    // phase), an Aggregate, or a Limit. The repo discipline
    // (pqErrorOutliers / TrendingTokens.topK) made machine-checked.
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, Sf).queryExecution.executedPlan
        val bad = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.filterNot { w =>
          w.child.collect {
            case w2: WindowExec if w2.partitionSpec.nonEmpty => w2
          }.nonEmpty ||
            w.child.collect {
              case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
            }.nonEmpty ||
            w.child.collect {
              case l: org.apache.spark.sql.execution.BaseLimitExec => l
            }.nonEmpty
        }
        if (bad.nonEmpty) offenders += name
      } catch {
        case e: Throwable => offenders += s"$name (failed to plan: ${e.getMessage.take(80)})"
      }
    }
    assert(offenders.isEmpty,
      s"queries with an unbounded global window: ${offenders.mkString(", ")}")
  }

  test("no shuffled join against a dimension-table side (nation/region broadcast)") {
    // nation and region are the star's k-row dimensions; a SortMergeJoin
    // or ShuffledHashJoin whose side scans them means a broadcast was
    // missed — the exchange costs more than shipping the whole table.
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, Sf).queryExecution.executedPlan
        val bad = plan.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.filter { j =>
          Seq(j.left, j.right).exists(side =>
            side.collect { case f: FileSourceScanExec => f }.exists(f =>
              f.relation.location.rootPaths.exists(p =>
                p.toString.contains("nation.parquet") ||
                  p.toString.contains("region.parquet"))))
        }
        if (bad.nonEmpty) offenders += name
      } catch {
        case e: Throwable => offenders += s"$name (failed to plan: ${e.getMessage.take(80)})"
      }
    }
    assert(offenders.isEmpty,
      s"queries shuffling a dimension join: ${offenders.mkString(", ")}")
  }
}
