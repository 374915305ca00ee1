package graft.ops

import graft.SparkSpec

/** Physical-plan assertions for the relational suite's scale-critical
  * shapes — these must never regress: a failed assertion means a plan
  * silently fell back to a strictly worse strategy.
  */
class RelationalPlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rank-filter window gets the group-limit pushdown on BOTH shuffle sides") {
    // row_number <= k must plan as WindowGroupLimit partial (map-side,
    // before the exchange) + final — each group's stream cuts to k rows
    // before shuffling, so the sort never sees the full per-key history
    val p = plan(Relational.windowLatestOrder(spark, Sf))
    val hits = "WindowGroupLimit".r.findAllIn(p).length
    assert(hits >= 2, s"expected partial+final WindowGroupLimit, got $hits in:\n$p")
  }

  test("global top-k plans as TakeOrderedAndProject, not sort-all") {
    val p = plan(Relational.topkRevenue(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for ORDER BY + LIMIT, got:\n$p")
  }

  test("interval islands run behind a single data exchange") {
    // both windows and the island rollup share the l_suppkey
    // partitioning; the only other exchange is the presentation sort
    val p = plan(Relational.intervalIslands(spark, Sf))
    val hash = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hash == 1, s"expected one hash exchange, got $hash in:\n$p")
  }
}
