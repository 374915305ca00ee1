package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.streaming.EventStream

/** Range (interval) join: points against `[start, end)` intervals.
  *
  * Spark executes a pure range predicate as a broadcast nested loop (or
  * worse, a cartesian) — O(|P| x |I|) comparisons. The scalable shape is
  * BINNING: every interval replicates to the fixed-width time bins it
  * overlaps, every point maps to its single bin, and the join becomes a
  * plain equi-join on the bin id plus an exact residual filter. Each
  * (interval, point) pair meets in exactly one bin (the point's), so no
  * dedup pass is needed; replication is bounded by interval span over
  * bin width, and the equi-join shuffles hash-partitioned like any
  * other — the plan that survives events tables at 100 TB where a
  * nested loop cannot start.
  */
object RangeJoin {

  /** Equi-binned range join returning point rows matched to interval
    * rows under `start <= pt < end`.
    *
    * @param points     point side; `ptCol` is its timestamp column
    * @param intervals  interval side with `startCol`/`endCol` timestamps
    * @param binSeconds bin width — tune to the typical interval span so
    *                   replication stays O(1) per interval
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      binSeconds: Long = 3600L): DataFrame = {
    val p = points.withColumn("_bin",
      floor(unix_timestamp(col(ptCol)) / binSeconds))
    // the end bin is floor(end / w) rather than floor((end-1) / w): one
    // bin of safe over-replication, because unix_timestamp truncates
    // sub-second parts and the exact residual filter prunes anyway
    val i = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds),
        floor(unix_timestamp(col(endCol)) / binSeconds))))
    p.join(i, "_bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }

  /** Graded query: cross-user session overlap — for each session window
    * of the first 50 users, how many events (from ALL users) fall inside
    * it. A genuine non-equi range join: the interval side carries no key
    * the point side shares.
    */
  def sessionOverlap(s: SparkSession, dir: String): DataFrame = {
    val events = Tables(s, dir, "events")
    val sessions = EventStream.sessionStats(events)
      .filter(col("user_id") < 50)
    val points = events.select(col("ts"), col("event_id"))
    binnedRangeJoin(points, sessions, "ts", "session_start", "session_end")
      .groupBy(col("session_start"), col("session_end"), col("user_id"))
      .agg(count(col("event_id")).as("n_overlapping"))
      .orderBy(col("user_id"), col("session_start"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_range_join_binned" -> (sessionOverlap _))

  /** DuckDB evaluates the same join as a plain inequality (theta) join —
    * an independent execution strategy over identical semantics. The
    * session CTE is the verified s02 definition.
    */
  val oracles: Map[String, String] = Map(
    "q39_range_join_binned" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |sessions AS (
        |  SELECT min(ts) AS session_start,
        |    max(ts) + INTERVAL '30 minutes' AS session_end,
        |    user_id
        |  FROM s GROUP BY user_id, sid)
        |SELECT sn.session_start, sn.session_end, sn.user_id,
        |  count(e.event_id) AS n_overlapping
        |FROM sessions sn JOIN events e
        |  ON e.ts >= sn.session_start AND e.ts < sn.session_end
        |WHERE sn.user_id < 50
        |GROUP BY 1, 2, 3
        |ORDER BY sn.user_id, sn.session_start""".stripMargin)
}
