package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.engine.Tables

/** Bloom-pruned semi join — the explicit form of the runtime row-level
  * filter Spark injects for selective joins, built on the SAME Catalyst
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, which
  * Spark does not expose as SQL functions): aggregate the dim side's
  * join keys into a bloom filter, ship the sketch as a LITERAL into a
  * fact-side pre-filter, then run the exact semi join over the pruned
  * remainder.
  *
  * Why it matters at 100 TB: the semi join still shuffles every fact row
  * whose key MIGHT match; with a selective dim, the bloom pre-filter
  * eliminates the overwhelming majority of fact rows BEFORE the
  * exchange, inside the scan's codegen stage. False positives only cost
  * wasted shuffle rows — the exact join removes them — so the operator's
  * OUTPUT is exactly the plain semi join, which is what lets the DuckDB
  * twin hash-gate a sketch-accelerated plan.
  *
  * The collected sketch is kilobytes (bounded by `numBits`, like the
  * broadcast the alternative plan would ship) — a k-bounded driver
  * collect, not a data-dependent one.
  */
object BloomJoin {

  /** Aggregate `c`'s xxhash64 into a bloom filter (binary sketch). */
  def bloomAgg(c: Column, estimatedItems: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)), estimatedItems).toAggregateExpression())

  /** Membership probe against a collected sketch, as a foldable literal
    * (BloomFilterMightContain requires a constant bloom side).
    */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloomBytes),
      ColumnBridge.expression(xxhash64(c))))

  /** Build the dim-side sketch. Exposed for the spec. */
  private[ops] def buildBloom(dim: DataFrame, key: String,
      estimatedItems: Long): Array[Byte] =
    dim.agg(bloomAgg(col(key), estimatedItems).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

  /** Events of users in one market segment, via bloom pre-filter + exact
    * semi join; output equals the un-pruned semi join row-for-row.
    */
  def bloomSemiReduction(s: SparkSession, dir: String,
      segment: String = "BUILDING"): DataFrame = {
    val dim = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey").as("user_id"))
    val sketch = buildBloom(dim, "user_id", 100000L)
    Tables(s, dir, "events")
      .filter(mightContain(sketch, col("user_id")))
      .join(dim, Seq("user_id"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_bloom_semi_reduction" -> ((s: SparkSession, dir: String) =>
      bloomSemiReduction(s, dir)))

  val oracles: Map[String, String] = Map(
    "q68_bloom_semi_reduction" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE user_id IN (SELECT c_custkey FROM customer
        |                  WHERE c_mktsegment = 'BUILDING')
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
