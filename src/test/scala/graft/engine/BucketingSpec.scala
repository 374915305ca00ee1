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

  test("bucketed star join (q37) plans its fact leg without an Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the fact-fact leg is a sort-merge join; the
      // dim legs then shuffle, but the bucketed li/o sides must not
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.ops.BucketedStar.ensure(spark, Sf)
      val li = spark.table(graft.ops.BucketedStar.bucketedTable(Sf, "lineitem"))
      val o = spark.table(graft.ops.BucketedStar.bucketedTable(Sf, "orders"))
      val plan = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed fact leg still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the full graded query computes exactly q05's result
    val bucketed = graft.ops.BucketedStar.joinStarBucketed(spark, Sf).collect().toSeq
    val plain = graft.ops.Relational.joinStar(spark, Sf).collect().toSeq
    assert(bucketed == plain)
  }

  test("aggregation on the bucket key reuses the bucketing (no exchange)") {
    val plan = spark.table("li_bkt")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }
}
