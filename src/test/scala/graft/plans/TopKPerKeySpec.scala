package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom physical operator's contract: equality with the window
  * spelling, the two-level plan shape (partial -> exchange -> final),
  * and the partial pass's k-per-key-per-partition shuffle bound.
  */
class TopKPerKeySpec extends SparkSpec {

  test("x178: operator output equals the window row_number spelling") {
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
    val got = TopKPerKey.topk(ev, Seq("event_type"), Seq("value" -> false, "event_id" -> true), 5)
      .collect().map(_.toSeq).toSet
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    val ref = ev.withColumn("rn", row_number().over(win)).filter(col("rn") <= 5)
      .drop("rn").collect().map(_.toSeq).toSet
    assert(got === ref)
  }

  test("plan shape: partial and final TopKPerKeyExec with one exchange between") {
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"))
    val df = TopKPerKey.topk(ev, Seq("event_type"), Seq("value" -> false, "event_id" -> true), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"partial node missing in:\n$plan")
    assert(plan.contains("TopKPerKeyFinal"), s"final node missing in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(event_type"),
      s"clustered exchange missing in:\n$plan")
    // the partial must sit BELOW the exchange, the final above
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    val iEx = plan.indexOf("Exchange hashpartitioning(event_type")
    assert(iFinal < iEx && iEx < iPartial, "order must be final > exchange > partial")
  }

  test("the partial pass bounds the shuffle to k rows per key per partition") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // one hot key spread over 8 partitions, 1000 rows: a window plan
      // shuffles all 1000; the partial must pass at most k*8
      val df = spark.range(0, 1000, 1, 8)
        .select(lit("hot").as("key"), col("id"),
          (col("id") % 97).as("value"))
      val top = TopKPerKey.topk(df, Seq("key"), Seq("value" -> false, "id" -> true), 4)
      val rows = top.collect()
      assert(rows.length === 4)
      val partials = top.queryExecution.executedPlan.collect {
        case t: TopKPerKeyExec if t.partial => t
      }
      assert(partials.length === 1)
      val moved = partials.head.metrics("numOutputRows").value
      assert(moved <= 4L * 8, s"partial emitted $moved rows — shuffle not bounded")
      assert(moved >= 4L, "partial must emit at least one key's k")
      // and the winners are the true top-4 under (value desc, id asc)
      val ref = (0L until 1000L).map(i => (i, i % 97))
        .sortBy { case (id, v) => (-v, id) }.take(4).map(_._1)
      assert(rows.map(_.getLong(1)).toSeq === ref)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ties: a total order makes the choice deterministic across runs") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 9.0))
      .toDF("key", "id", "value")
    val pick = (1 to 3).map { _ =>
      TopKPerKey.topk(df.repartition(4), Seq("key"), Seq("value" -> false, "id" -> true), 2)
        .collect().map(_.getLong(1)).sorted.toSeq
    }
    assert(pick.forall(_ === Seq(1L, 2L)), s"tie-break must pick ids 1,2: $pick")
  }

  test("x179: TopKRewrite swaps the window spelling onto the operator, same rows") {
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    val plain = ev.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 5).drop("rn")
    val rewritten = TopKPerKey.topkRewriteQuery(spark, Sf, 5)
    assert(rewritten.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
    // the returned frame is the checkpoint; prove the rewrite fires by
    // optimizing the same shape with the rule active
    org.apache.spark.sql.graft.PlanBridge.ensureOptimizerRule(spark, TopKRewrite)
    try {
      // fresh Dataset: QueryExecution is cached per frame, so the idiom
      // must be rebuilt AFTER the rule lands
      val plain2 = ev.withColumn("rn", row_number().over(win))
        .filter(col("rn") <= 5).drop("rn")
      assert(plain2.queryExecution.optimizedPlan
        .exists(_.isInstanceOf[TopKPerKeyPlan]), "rewrite must fire on the idiom")
      // negative: keeping the rank column blocks the rewrite
      val keeps = ev.withColumn("rn", row_number().over(win)).filter(col("rn") <= 5)
      assert(!keeps.queryExecution.optimizedPlan
        .exists(_.isInstanceOf[TopKPerKeyPlan]),
        "a projection that keeps rn must NOT rewrite")
      // negative: rank() keeps ties — different semantics, no rewrite
      val rk = ev.withColumn("rn", rank().over(win)).filter(col("rn") <= 5).drop("rn")
      assert(!rk.queryExecution.optimizedPlan
        .exists(_.isInstanceOf[TopKPerKeyPlan]), "rank() must NOT rewrite")
    } finally org.apache.spark.sql.graft.PlanBridge.removeOptimizerRule(spark, TopKRewrite)
  }

  test("SQL-extension path: the strategy injects via GraftExtensions too") {
    import org.apache.spark.sql.SparkSession
    // force the shared session to exist, then build a fresh one with the
    // extensions (the GraftExtensionsSpec discipline), restore after
    spark.range(1).count()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val strategies = s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.planner.extraPlanningStrategies
      assert(strategies.exists(_ eq TopKPerKeyStrategy),
        "GraftExtensions must register TopKPerKeyStrategy")
      val df = s2.read.parquet(s"$Sf/events.parquet")
        .select(col("event_type"), col("event_id"), col("value"))
      val n = TopKPerKey.topk(df, Seq("event_type"), Seq("value" -> false, "event_id" -> true), 2).count()
      assert(n > 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
