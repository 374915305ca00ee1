package graft.ops

import graft.SparkSpec
import graft.plans.MvQueries

/** The serving/audit split for the cardinality-estimation lanes: the
  * `*_served` forms must plan WITHOUT the exact anchor leg — at 100 TB
  * the anchor is the very join/self-join the sketch exists to avoid —
  * while the audit forms keep it. Gated structurally by counting base
  * scans in the optimized plan: an anchor can't hide, it needs its own
  * read of the fact table(s).
  */
class SketchPlanSpec extends SparkSpec {

  private def scans(df: org.apache.spark.sql.DataFrame, frag: String): Int =
    MvQueries.scanPaths(df.queryExecution.optimizedPlan).count(_.contains(frag))

  test("q81 served has no raw rescan (sketch checkpointed); audit's only scans are the anchor") {
    val served = Sketches.joinCardServed(spark, Sf)
    assert(scans(served, "orders.parquet") === 0)
    assert(scans(served, "lineitem.parquet") === 0)
    val audit = Sketches.joinCardEst(spark, Sf)
    assert(scans(audit, "orders.parquet") === 1)
    assert(scans(audit, "lineitem.parquet") === 1)
  }

  test("x206 served has no base scan left (all behind the bucket agg); audit keeps the anchor join") {
    val served = Sketches.histJoinServed(spark, Sf)
    // bucket rows are checkpointed pre-aggregates; zero raw rescans
    assert(scans(served, "orders.parquet") === 0)
    assert(scans(served, "customer.parquet") === 0)
    val audit = Sketches.histJoinEst(spark, Sf)
    assert(scans(audit, "orders.parquet") === 1)
    assert(scans(audit, "customer.parquet") === 1)
  }

  test("x171 served carries no self-join anchor; neither form rescans the corpus") {
    // the element frame is built once per session (checkpointed +
    // memoized), so NEITHER form's final plan scans documents; the
    // audit form's anchor is the element-frame self-join on h plus its
    // left-join merge — exactly two more Join nodes than the served
    // sketch algebra
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    val served = Sketches.bottomkOverlap(spark, Sf, withAnchor = false)
    val audit = Sketches.bottomkOverlap(spark, Sf)
    assert(scans(served, "documents.parquet") === 0)
    assert(scans(audit, "documents.parquet") === 0)
    assert(!served.columns.contains("exact_intersection"))
    assert(audit.columns.contains("exact_intersection"))
    assert(joins(audit) === joins(served) + 2,
      s"audit=${joins(audit)} served=${joins(served)}")
  }

  test("served estimates equal the audit forms' estimate columns") {
    val auditQ81 = Sketches.joinCardEst(spark, Sf)
      .select("i", "est_i", "est").collect().map(_.toString).toSeq
    val servedQ81 = Sketches.joinCardServed(spark, Sf)
      .collect().map(_.toString).toSeq
    assert(servedQ81 === auditQ81)
    val est171 = Sketches.bottomkOverlap(spark, Sf, withAnchor = false).columns.toSeq
    val audit171 = Sketches.bottomkOverlap(spark, Sf)
      .select(est171.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).toSeq
    val served171 = Sketches.bottomkOverlap(spark, Sf, withAnchor = false)
      .collect().map(_.toString).toSeq
    assert(served171 === audit171)
  }
}
