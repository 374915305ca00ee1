package graft.engine

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Load-side JDBC counterpart of [[JdbcSource]] — the reference's actual
  * warehouse load (Postgres `execute_values` INSERT behind a day-window
  * DELETE, `dags/flights_data_pipeline.py:168-195`), re-expressed as
  * Spark's partition-parallel JDBC writer plus a database-side window
  * delete:
  *
  *   - S8 `append`: plain batch INSERT (one connection per input
  *     partition — the JDBC write scale knob is the DataFrame's
  *     partition count);
  *   - S7 `truncateLoad`: truncate + reload, keeping the table's DDL
  *     (indexes, grants) — Spark's `truncate` option instead of
  *     drop/recreate;
  *   - S6 `loadDay`: the idempotent windowed load — DELETE the closed
  *     day window `[ds 00:00:00, ds 23:59:59]` on the DATABASE, then
  *     INSERT the increment. A replay deletes its own previous attempt
  *     first, so retries never double-load (the same contract
  *     `Sinks.overwriteDayPartitions` gives parquet); a crash between
  *     the delete and the insert is repaired by the retry for the same
  *     reason. The increment is filtered to the window before writing —
  *     rows outside `ds` would survive a replay's delete and break
  *     idempotency, so the sink refuses to write them.
  *
  * @param url        JDBC url (e.g. `jdbc:postgresql://host/db`)
  * @param table      target table (must exist; the reference creates DDL
  *                   out-of-band, `init.sql`)
  * @param tsCol      event-time column the day window delete filters on
  * @param options    passthrough writer options (`user`, `password`,
  *                   `batchsize`, `isolationLevel`, ...); `user`/
  *                   `password` are also applied to the delete connection
  * @param tsLiteral  renders `yyyy-MM-dd HH:mm:ss` as the database's
  *                   timestamp literal (Postgres `TIMESTAMP '...'`
  *                   default; Derby wants `TIMESTAMP('...')`)
  */
final case class JdbcSink(
    url: String,
    table: String,
    tsCol: String,
    options: Map[String, String] = Map.empty,
    tsLiteral: String => String = ts => s"TIMESTAMP '$ts'") {

  private def writer(df: DataFrame) =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)

  /** S8: batch append INSERT. */
  def append(df: DataFrame): Unit =
    writer(df).mode(SaveMode.Append).save()

  /** S7: truncate + reload (keeps the table's DDL). */
  def truncateLoad(df: DataFrame): Unit =
    writer(df).option("truncate", "true").mode(SaveMode.Overwrite).save()

  /** The database-side window delete, exposed for inspection/tests the
    * same way `JdbcSource.dayWindowSql` is.
    */
  def deleteWindowSql(ds: String): String =
    s"DELETE FROM $table WHERE $tsCol BETWEEN ${tsLiteral(s"$ds 00:00:00")}" +
      s" AND ${tsLiteral(s"$ds 23:59:59")}"

  /** S6: idempotent windowed load. Returns `Loaded(n)` with the row
    * count actually written (one persisted snapshot backs the emptiness
    * check, the write, and the count), or `SkippedEmpty` — in which case
    * the target is untouched, the P3 skip contract.
    */
  def loadDay(df: DataFrame, ds: String): Incremental.LoadStatus = {
    val pinned = Incremental.dayWindow(df, tsCol, ds).persist()
    try {
      val rows = pinned.count()
      if (rows == 0) Incremental.SkippedEmpty
      else {
        deleteWindow(ds)
        append(pinned)
        Incremental.Loaded(rows)
      }
    } finally pinned.unpersist()
  }

  private def deleteWindow(ds: String): Unit = {
    val props = new Properties()
    options.get("user").foreach(props.setProperty("user", _))
    options.get("password").foreach(props.setProperty("password", _))
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(deleteWindowSql(ds)) finally st.close()
    } finally conn.close()
  }
}
