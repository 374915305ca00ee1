package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x204 MV substitution: the served result must equal the direct
  * computation bitwise while scanning only the MV; shapes the MV
  * cannot answer (uncovered keys, AVG, filters) must keep the base
  * scan.
  */
class MvRewriteSpec extends SparkSpec {

  private def withRule[T](body: => T): T = {
    val mvPath = MvQueries.ensureMv(spark, Sf)
    MvRewrite.register("lineitem.parquet", MvRewrite.MvDef(mvPath,
      Set("l_returnflag", "l_linestatus", "ship_month"),
      Set("l_quantity", "l_extendedprice")))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try body finally {
      spark.experimental.extraOptimizations = prev
      MvRewrite.clear()
    }
  }

  test("substituted rollup equals the direct computation bitwise") {
    val served = MvQueries.mvServedQuery(spark, Sf).collect().map(_.toString)
    val direct = MvQueries.directQuery(spark, Sf).collect().map(_.toString)
    assert(served.toSeq === direct.toSeq)
    assert(served.nonEmpty)
  }

  test("unanswerable shapes keep the base scan") {
    withRule {
      val li = graft.engine.Tables(spark, Sf, "lineitem")
      // (a) group key not covered by the MV
      val byOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
      assert(MvQueries.scanPaths(byOrder.queryExecution.optimizedPlan)
        .exists(_.contains("lineitem.parquet")), "uncovered key must not rewrite")
      // (b) AVG is not re-aggregable from these partials
      val avgQ = li.groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("a"))
      assert(MvQueries.scanPaths(avgQ.queryExecution.optimizedPlan)
        .exists(_.contains("lineitem.parquet")), "avg must not rewrite")
      // (c) a filter below the aggregate is unanswerable from the MV
      val filtered = li.filter(col("l_orderkey") > 10)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
      assert(MvQueries.scanPaths(filtered.queryExecution.optimizedPlan)
        .exists(_.contains("lineitem.parquet")), "filter must not rewrite")
      // and the covered shape DOES rewrite in the same session scope
      val covered = li
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(12,2)").as("l_quantity"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
      val paths = MvQueries.scanPaths(covered.queryExecution.optimizedPlan)
      assert(paths.exists(_.contains("lineitem_mv")) &&
        !paths.exists(_.contains("lineitem.parquet")),
        s"covered single-key rollup must rewrite; scans: $paths")
    }
  }
}
