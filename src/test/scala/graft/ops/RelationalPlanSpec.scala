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

  test("skew report's hot-key selection is a top-k, not a full sort") {
    val p = plan(Skew.skewReport(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"hot-key selection must plan as top-k:\n$p")
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

  test("batch sessionization shares ONE user_id exchange across windows and rollup") {
    // the lag window, the running-sum window, and the session aggregate
    // all key on user_id — more than one hash exchange means a window
    // stopped reusing the partitioning
    val p = plan(Scalars.sessionizeBatch(spark, Sf))
    val hash = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hash == 1, s"expected one hash exchange, got $hash in:\n$p")
  }

  test("gopher rules plan is a pure map: no exchange before the presentation sort") {
    val p = plan(graft.ext.TextAnalysis.gopherRules(spark, Sf))
    val hash = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hash == 0, s"a corpus filter must not shuffle, got $hash in:\n$p")
  }

  test("bloom pre-filter evaluates inside the events scan stage, before any exchange") {
    val dim = graft.engine.Tables(spark, Sf, "customer")
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .select(org.apache.spark.sql.functions.col("c_custkey").as("user_id"))
    val sketch = BloomJoin.buildBloom(dim, "user_id", 100000L)
    val pruned = graft.engine.Tables(spark, Sf, "events")
      .filter(BloomJoin.mightContain(sketch, org.apache.spark.sql.functions.col("user_id")))
    val p = plan(pruned)
    assert(p.contains("might_contain"),
      s"bloom probe missing from the plan:\n$p")
    assert(!p.contains("Exchange"),
      s"the pre-filter alone must not introduce an exchange:\n$p")
  }

  test("x181: recursive CTE chains obey the halving-depth law and plan as UnionLoop") {
    val df = Relational.recursiveAncestry(spark, Sf)
    val rows = df.collect()
    rows.foreach { r =>
      val (ck, nAnc, depth) = (r.getLong(0), r.getLong(1), r.getInt(3))
      // the chain c -> c/2 -> ... -> 1 has floor(log2(c)) steps
      val expect = 63 - java.lang.Long.numberOfLeadingZeros(ck)
      assert(depth === expect, s"custkey $ck depth")
      assert(nAnc === expect.toLong, s"custkey $ck chain length")
    }
    assert(df.queryExecution.optimizedPlan.toString.contains("UnionLoop"),
      "the recursion must plan through Spark's UnionLoop, not an unrolled union")
  }

  test("x182: variant probes type correctly and miss without error") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 7, "s": "x"}"""), (2L, """{"k": 40}"""))
      .toDF("id", "props")
      .selectExpr("id", "parse_json(props) AS v")
      .selectExpr("id",
        "variant_get(v, '$.k', 'long') AS k",
        "variant_get(v, '$.k', 'string') AS ks",
        "variant_get(v, '$.nope', 'long') AS missing")
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.isNullAt(3))).toMap
    assert(rows(1L) === ((7L, "7", true)))
    assert(rows(2L) === ((40L, "40", true)))
  }
}
