package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DSv2 JDBC — the completion of the S1/S2 extract story. The DSv1
  * [[JdbcSource]] splices the day window into the `dbtable` subquery
  * (guaranteed database-side, any predicate shape, but ONLY the shapes
  * we splice). Registering the database as a V2 catalog instead lets
  * Spark's V2ScanRelationPushDown drive ARBITRARY query shapes down:
  *
  *   - predicate pushdown: any Catalyst filter the dialect can compile
  *     (`PushedFilters` in the scan);
  *   - column pruning: the scan's SELECT list is the query's
  *     (`ReadSchema`);
  *   - aggregate pushdown: whole GROUP BY plans run in the database
  *     (`PushedAggregates` / `PushedGroupByExpressions`) — an extract
  *     that ships per-group counts instead of rows;
  *   - top-N pushdown: ORDER BY + LIMIT becomes the database's
  *     `PushedTopN`.
  *
  * Measured against Derby (JdbcV2Spec): filters, pruning and whole
  * aggregates push; limit/top-N pushdown is gated OFF by default —
  * see [[JdbcV2.register]] for the measured Derby wrong-results bug
  * behind that default. At 100 TB the win is the usual one: the wire
  * carries the increment, the projection, or the aggregate — never
  * the table.
  */
object JdbcV2 {

  /** Register `name` as a JDBC V2 catalog over `url`. Idempotent —
    * re-registering with the same url is a no-op config overwrite.
    *
    * `pushDownLimits` defaults FALSE deliberately: Spark 4.1's
    * DerbyDialect advertises limit support but `getLimitClause` renders
    * an EMPTY clause, so a pushed top-N sorts in the database, never
    * limits, and Spark — trusting the full pushdown — returns every
    * row for a `.limit(n)` query (measured in JdbcV2Spec; a wrong-
    * RESULTS failure, not a perf one). Turn it on per-catalog for
    * dialects whose limit clause is real (Postgres, MySQL).
    */
  def register(spark: SparkSession, name: String, url: String,
      extra: Map[String, String] = Map.empty,
      pushDownLimits: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", pushDownLimits.toString)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownOffset", pushDownLimits.toString)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    extra.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v) }
  }

  /** The table as a V2 relation — every downstream filter/projection/
    * aggregate is a pushdown candidate.
    */
  def table(spark: SparkSession, catalog: String, schema: String,
      tableName: String): DataFrame =
    spark.table(s"$catalog.$schema.$tableName")

  /** The executed scan's description — the spec's pushdown gate reads
    * `PushedFilters` / `PushedAggregates` / `PushedTopN` / `ReadSchema`
    * out of it.
    */
  def scanDescription(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
}

/** [[Source]] over a V2 catalog table: `loadDay` is a PLAIN Catalyst
  * filter — V2 pushdown carries it to the database, so the increment
  * never crosses the wire, without the dbtable-splice contortion.
  */
final case class JdbcV2Source(catalog: String, schema: String,
    tableName: String, tsCol: String) extends Source {

  override def load(spark: SparkSession): DataFrame =
    JdbcV2.table(spark, catalog, schema, tableName)

  override def loadDay(spark: SparkSession, ds: String): DataFrame =
    Incremental.dayWindow(load(spark), tsCol, ds)
}
