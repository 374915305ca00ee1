package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The point of bucketing is a plan property: joins and aggregations on
  * the bucket key must run with NO Exchange on the bucketed sides.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val li = Tables(spark, Sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, Sf, "orders").select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey")
    Bucketing.writeBucketed(o, "o_bkt", "o_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables(spark, Sf, "lineitem")
        .join(Tables(spark, Sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key reuses the bucketing (no exchange)") {
    val plan = spark.table("li_bkt")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }
}
