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
