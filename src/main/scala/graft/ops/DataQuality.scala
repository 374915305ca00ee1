package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Declarative data-quality checks — the dbt-test layer the reference's
  * warehouse would grow: primary-key uniqueness, referential integrity,
  * not-null, accepted values, and range checks, each expressed as a
  * violation-counting aggregate and unioned into one (check, table,
  * n_violations, passed) report.
  *
  * Scale shape: every check is a single scan-side aggregate (the FK
  * check an anti-join against the parent keys); checks over the same
  * table could share one pass, but independent checks parallelize as
  * independent jobs and each pushes only its own columns into the scan.
  */
object DataQuality {

  private def report(s: SparkSession, dir: String,
      rows: Seq[(String, String, DataFrame)]): DataFrame = {
    rows.map { case (name, table, violas) =>
      violas.agg(count(lit(1)).cast("long").as("n_violations"))
        .select(lit(name).as("check"), lit(table).as("table_name"),
          col("n_violations"), (col("n_violations") === 0L).as("passed"))
    }.reduce(_ unionByName _)
      .orderBy(col("check"))
  }

  /** The standard check suite over the TPC-H-ish tables. */
  def standardChecks(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val lineitem = Tables(s, dir, "lineitem")
    val customer = Tables(s, dir, "customer")
    report(s, dir, Seq(
      ("pk_unique_orders", "orders",
        orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)),
      ("fk_lineitem_orders", "lineitem",
        lineitem.join(orders.select(col("o_orderkey")),
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")),
      ("not_null_customer_name", "customer",
        customer.filter(col("c_name").isNull)),
      ("accepted_values_orderstatus", "orders",
        orders.filter(!col("o_orderstatus").isin("F", "O", "P"))),
      ("range_quantity", "lineitem",
        lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_data_quality" -> (standardChecks _))

  val oracles: Map[String, String] = Map(
    "q42_data_quality" ->
      """SELECT * FROM (
        |  SELECT 'pk_unique_orders' AS "check", 'orders' AS table_name,
        |    CAST(count(*) AS BIGINT) AS n_violations, count(*) = 0 AS passed
        |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', 'lineitem',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'not_null_customer_name', 'customer',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM customer WHERE c_name IS NULL
        |  UNION ALL
        |  SELECT 'accepted_values_orderstatus', 'orders',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM orders WHERE o_orderstatus NOT IN ('F', 'O', 'P')
        |  UNION ALL
        |  SELECT 'range_quantity', 'lineitem',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
        |ORDER BY "check"""".stripMargin)
}
