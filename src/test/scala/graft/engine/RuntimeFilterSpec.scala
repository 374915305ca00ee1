package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter semi-join reduction: when a selective dimension
  * filter feeds a shuffle join, Spark can inject a bloom filter built
  * from the build side into the probe side's scan, discarding
  * non-matching fact rows BEFORE the shuffle. The size thresholds exist
  * because the rewrite pays off at large scans (default application-side
  * threshold is 10 GB); this spec pins that the rewrite engages and
  * stays correct once thresholds are met — the config a 100 TB
  * deployment relies on.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("dim filter dynamically prunes the day-partitioned fact at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString + "/fact"
    val ev = Tables(spark, Sf, "events").filter(col("ts").between(
      lit("2024-01-03 00:00:00").cast("timestamp"),
      lit("2024-01-05 23:59:59").cast("timestamp")))
    Sinks.overwriteDayPartitions(ev, "ts", dir)
    val fact = spark.read.parquet(dir)
    // DPP needs a scan-based filtering side with a selective predicate —
    // an in-memory LocalRelation dim never triggers the rewrite
    val dimPath = dir + "_dim"
    Seq(("2024-01-04", "keep"), ("2024-01-05", "drop"))
      .toDF("d", "tag").select(col("d").cast("date").as("d"), col("tag"))
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val j = fact.join(dim, fact("p_date") === dim("d"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery on the fact scan:\n$plan")
    val expected = ev.filter(to_date(col("ts")) === lit("2024-01-04").cast("date")).count()
    assert(j.count() == expected && expected > 0,
      "pruned execution must return exactly the kept day's rows")
  }

  test("selective join injects a bloom filter on the probe side and stays correct") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables(spark, Sf, "lineitem")
      val o = Tables(spark, Sf, "orders").filter(col("o_orderstatus") === "P")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"expected an injected runtime bloom filter:\n$plan")
      val n = j.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == plain, "the bloom filter must never change the result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
