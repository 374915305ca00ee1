package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extract-side abstraction (SURVEY.md §2.1 S1/S2): one interface for
  * "scan the whole table" and "scan one logical day", with the two
  * source families the reference pipeline spans —
  *
  *   - [[ParquetSource]]: the lakehouse path this library runs on; the
  *     day window is a Catalyst filter that pushes down to the parquet
  *     scan (PushedFilters);
  *   - [[JdbcSource]]: the reference's actual extract (Postgres over
  *     JDBC, `dags/flights_data_pipeline.py:94-148`); the day window is
  *     spliced into the `dbtable` subquery so the DATABASE evaluates it
  *     — only the increment ever crosses the wire, mirroring the
  *     reference's `WHERE updated_at BETWEEN %s AND %s` extract query.
  *
  * `Pipeline`/`Incremental` operate on DataFrames, so either source
  * drops in ahead of the same load path.
  */
trait Source {
  /** S1: full-table extract. */
  def load(spark: SparkSession): DataFrame

  /** S2: closed-interval day extract `[ds 00:00:00, ds 23:59:59]` —
    * the reference's exact window, boundary inclusivity preserved.
    */
  def loadDay(spark: SparkSession, ds: String): DataFrame
}

/** Parquet-backed source; the day window is a pushed-down scan filter. */
final case class ParquetSource(path: String, tsCol: String) extends Source {
  override def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
  override def loadDay(spark: SparkSession, ds: String): DataFrame =
    Incremental.dayWindow(load(spark), tsCol, ds)
}

/** JDBC-backed source.
  *
  * @param url        JDBC url (e.g. `jdbc:postgresql://host/db`)
  * @param table      table (or any relation) name on the database
  * @param tsCol      event-time column the day window filters on
  * @param options    passthrough reader options — supply `numPartitions`
  *                   + `partitionColumn` + bounds for parallel extracts
  *                   of large tables (one connection per partition, the
  *                   JDBC scale knob)
  * @param tsLiteral  renders a `yyyy-MM-dd HH:mm:ss` string as the
  *                   database's timestamp literal; default is the ANSI
  *                   form Postgres accepts (`TIMESTAMP '...'`) — Derby
  *                   wants `TIMESTAMP('...')`, see the spec
  */
final case class JdbcSource(
    url: String,
    table: String,
    tsCol: String,
    options: Map[String, String] = Map.empty,
    tsLiteral: String => String = ts => s"TIMESTAMP '$ts'") extends Source {

  private def read(spark: SparkSession, dbtable: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .options(options)
      .load()

  override def load(spark: SparkSession): DataFrame = read(spark, table)

  /** The pushdown: the window lives INSIDE the `dbtable` subquery, so it
    * executes on the database regardless of what Spark's JDBC filter
    * pushdown would do with a post-hoc `.filter`.
    */
  def dayWindowSql(ds: String): String =
    s"(SELECT * FROM $table WHERE $tsCol BETWEEN ${tsLiteral(s"$ds 00:00:00")}" +
      s" AND ${tsLiteral(s"$ds 23:59:59")}) graft_incr"

  override def loadDay(spark: SparkSession, ds: String): DataFrame =
    read(spark, dayWindowSql(ds))
}
