package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Table profiling — the data-quality pass a pipeline runs before
  * trusting a new load: per column, row count, non-null count, null
  * count and distinct count, computed in ONE scan (a wide aggregate
  * melted back to one row per column with `stack`). At 100 TB the single
  * pass matters: a per-column loop would re-read the table N times;
  * this reads it once and lets the aggregate do map-side partials
  * (the distinct counts expand internally — swap them for
  * approx_count_distinct when exactness isn't required, see
  * `ops/Sketches.scala`).
  */
object Profile {

  /** One row per profiled column: (column_name, n_rows, n_nonnull,
    * n_nulls, n_distinct).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"), col("n_distinct"))
      .orderBy(col("column_name"))
  }

  private val OrdersCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_profile" -> ((s: SparkSession, dir: String) =>
      profile(Tables(s, dir, "orders"), OrdersCols)))

  val oracles: Map[String, String] = Map(
    "q34_profile" -> OrdersCols.map(c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows, count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct
         |FROM orders""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
}
