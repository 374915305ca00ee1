package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Incremental micro-batch semantics (SURVEY.md §2.1 S2, §2.2 P2/P3,
  * §2.9): one logical date `ds` per run, data sliced by a CLOSED
  * `updated_at` interval — `[ds 00:00:00, ds 23:59:59]`, the reference's
  * exact window (`dags/flights_data_pipeline.py:102-109`), boundary
  * inclusivity and sub-second-tail loss faithfully preserved.
  */
object Incremental {

  /** Per-table outcome of one (table, ds) load — the reference's
    * AirflowSkipException becomes a value (`:115-117`).
    */
  sealed trait LoadStatus
  final case class Loaded(rows: Long) extends LoadStatus
  case object SkippedEmpty extends LoadStatus

  /** S2/P2: the closed day-window predicate. Comparison against timestamp
    * literals parsed in the session timezone; pushes down to the scan.
    */
  def dayWindow(df: DataFrame, tsCol: String, ds: String): DataFrame =
    df.filter(col(tsCol).between(
      lit(s"$ds 00:00:00").cast(TimestampType),
      lit(s"$ds 23:59:59").cast(TimestampType)))

  /** S2+S6+P3: windowed extract -> skip-on-empty -> idempotent
    * day-partition overwrite into `path`. The increment is persisted for
    * the count/write pair so both see the SAME snapshot (a re-scanned
    * source could change between actions and make the returned row count
    * disagree with what was written).
    */
  def loadTableFor(source: DataFrame, tsCol: String, ds: String, path: String): LoadStatus = {
    val increment = dayWindow(source, tsCol, ds).persist()
    try {
      val rows = increment.count()
      if (rows == 0) SkippedEmpty
      else {
        Sinks.overwriteDayPartitions(increment, tsCol, path)
        Loaded(rows)
      }
    } finally increment.unpersist()
  }
}
