package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.Tables

/** Streaming semantics (SURVEY.md §2.9). The reference's only "stream"
  * is the daily incremental micro-batch (`@daily` + `catchup=True`,
  * `dags/flights_data_pipeline.py:63-66`) whose fixed day window silently
  * drops late data; `Pipeline.runFor` reproduces that batch parity. This
  * module is the idiomatic upgrade: event-time windows + watermarks over
  * the `events` stream, which handle late data *correctly* instead.
  *
  * Every transform here is a plain DataFrame function, so the SAME code
  * runs in batch (driver-gradable, DuckDB oracle) and under
  * `readStream` (StreamingSpec drives it through MemoryStream) — the
  * unified-engine property that makes Structured Streaming the right
  * substrate for the 100 TB path: watermarked windowed aggregation is
  * partition-parallel per key and stateful only within the watermark
  * horizon.
  */
object EventStream {

  /** Tumbling 1-hour event-time windows with order-independent
    * aggregates (count/min/max — double `sum` would be float-order
    * dependent and oracle-unfriendly).
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("min_value"), col("max_value"))

  /** Streaming variant: watermarked so append mode can finalize windows
    * and state is bounded by the horizon.
    */
  def hourlyStatsStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    hourlyStats(events.withWatermark("ts", watermark))

  /** Chained time-window aggregation — hourly counts rolled up again
    * into daily totals INSIDE one query (two stateful aggregations
    * back-to-back, the Spark 3.4+ multiple-stateful-operator feature):
    * the inner window pre-reduces the stream to hour grain, so the
    * daily state holds one row per (day, type) instead of re-scanning
    * raw events — the cascade every metrics rollup wants. `window_time`
    * re-derives event time from the finalized hourly window so the
    * outer watermark keeps propagating.
    */
  def chainedWindowStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(window(window_time(col("window")), "1 day"), col("event_type"))
      .agg(sum(col("n_events")).cast("long").as("n_events_day"),
        count(lit(1)).as("n_hours"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_events_day"), col("n_hours"))

  /** Streaming variant: watermark on the raw stream; the finalized
    * hourly windows feed the daily aggregate as they close.
    */
  def chainedWindowStatsStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    chainedWindowStats(events.withWatermark("ts", watermark))

  /** Exactly-once-per-id event dedup within the watermark horizon —
    * streaming `dropDuplicates`, the at-scale guard against at-least-once
    * sources.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Sliding 1-hour windows every 15 minutes: each event lands in 4
    * overlapping windows (the smoothing view a monitoring dashboard
    * reads). Spark's `window(ts, size, slide)` expands the per-event
    * window set map-side, then it's an ordinary hash-aggregate — state
    * is bounded by (horizon / slide) windows per key under a watermark.
    */
  def slidingStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("n_users"))

  /** Streaming variant (distinct users via in-window first-seen dedup —
    * streaming aggregation cannot hold a COUNT(DISTINCT) buffer, so
    * dedup-then-count is the streaming spelling).
    */
  def slidingCountsStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"))

  /** Session windows per user: activity separated by >= `gap` starts a
    * new session.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n_events"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, max_value: Double)

  /** Custom keyed state (the §2.8 extension surface the reference lacks):
    * per-user running count/max via flatMapGroupsWithState — emits the
    * updated aggregate on every micro-batch touching the user.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, Double.MinValue))
          val next = it.foldLeft(prev)((acc, e) =>
            UserRunning(uid, acc.n_events + 1, math.max(acc.max_value, e.value)))
          state.update(next)
          Iterator.single(next)
      }
  }

  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Session close via event-time TIMEOUT (the custom-state counterpart
    * of `session_window`): per-user state accumulates start/end/count
    * across micro-batches and registers a timeout at last-event + gap;
    * when the WATERMARK passes that point the state times out and the
    * CLOSED session is emitted exactly once — the emit-on-close contract
    * downstream consumers (billing, abuse scoring) need, which the
    * windowed aggregate's append output gives per window, not per
    * session decision point. State is one small row per ACTIVE user —
    * bounded by the watermark horizon, the property that lets this run
    * forever at any user cardinality.
    */
  def timeoutSessions(events: Dataset[UserEvent],
      gapMinutes: Int = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMillis = gapMinutes * 60000L
    events.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClosedSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[ClosedSession]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            // fold this batch's events in event-time order, CLOSING the
            // running session whenever the next event starts past the
            // gap — a batch can span several sessions and must not lump
            // them (the watermark timeout only closes the idle tail)
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              cur = cur match {
                case Some(c) if e.ts.getTime > c.session_end.getTime + gapMillis =>
                  closed += c
                  Some(ClosedSession(uid, e.ts, e.ts, 1L))
                case Some(c) =>
                  Some(ClosedSession(uid, c.session_start,
                    new java.sql.Timestamp(math.max(c.session_end.getTime, e.ts.getTime)),
                    c.n_events + 1))
                case None => Some(ClosedSession(uid, e.ts, e.ts, 1L))
              }
            }
            cur.foreach { c =>
              state.update(c)
              // Spark does NOT watermark-filter input to
              // flatMapGroupsWithState: an at-least-once replay after
              // downtime can deliver an event with ts + gap <= the current
              // watermark, and an unclamped setTimeoutTimestamp throws
              // IllegalArgumentException — killing the query permanently.
              // Clamp to watermark + 1 ms: the stale session then times out
              // at the next trigger, emitted once, just late.
              state.setTimeoutTimestamp(math.max(
                c.session_end.getTime + gapMillis,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Stream-static enrichment: each micro-batch left-joins the broadcast
    * dimension — the streaming analog of the star schema's dim joins
    * (the static side re-resolves per batch, so a refreshed dim table is
    * picked up without restarting the query).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String = "event_type"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: clicks matched to the same user's view
    * events from the preceding `lookback` — the attribution join
    * ("which impression led to this click") that only works as
    * stream-stream because BOTH sides arrive continuously. Watermarks on
    * both inputs plus the time-bound join condition let Spark expire
    * buffered state: a view older than `lookback` past the click
    * watermark can never match again and is dropped — bounded state at
    * any throughput, the property that makes this runnable forever.
    */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
      watermark: String = "1 hour", lookback: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    c.join(v,
      expr(s"""click_ts >= view_ts AND click_ts - INTERVAL $lookback <= view_ts""")
        && c("user_id") === v("user_id"))
      .select(col("click_id"), c("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Left-outer stream-stream attribution: every click emits, matched to
    * its same-user views inside the lookback when they exist, with a
    * NULL view side otherwise — the "unattributed conversion" lane a
    * marketing pipeline needs, which the inner join (s03) silently
    * drops. Spark holds an unmatched click in state until BOTH
    * watermarks pass its join window, then emits the null-extended row
    * exactly once — so the outer result is late-data-correct, not a
    * guess made at arrival time. Same bounded state as the inner join.
    */
  def clickViewLeftJoin(clicks: DataFrame, views: DataFrame,
      watermark: String = "1 hour", lookback: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    c.join(v,
      expr(s"""click_ts >= view_ts AND click_ts - INTERVAL $lookback <= view_ts""")
        && c("user_id") === v("user_id"),
      "left_outer")
      .select(col("click_id"), c("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Full-outer stream-stream attribution: clicks AND views both emit,
    * null-extended when the other side never arrives inside the
    * lookback — the complete reconciliation view (unattributed clicks
    * plus orphan impressions in one stream). Both sides' unmatched rows
    * are held until both watermarks pass their window, then emitted
    * exactly once, same bounded state as the inner/left variants.
    */
  def clickViewFullJoin(clicks: DataFrame, views: DataFrame,
      watermark: String = "1 hour", lookback: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
    c.join(v,
      expr(s"""click_ts >= view_ts AND click_ts - INTERVAL $lookback <= view_ts""")
        && col("click_user") === col("view_user"),
      "full_outer")
      .select(col("click_id"), col("click_ts"),
        coalesce(col("click_user"), col("view_user")).as("user_id"),
        col("view_id"), col("view_ts"))
  }

  /** Idempotent per-batch load: each micro-batch lands in its own
    * `_batch_id=<id>` partition via dynamic partition overwrite, so a
    * replayed batch (foreachBatch is at-least-once on failure/restart)
    * OVERWRITES its own partition instead of appending twice. Readers of
    * `path` see an extra `_batch_id` partition column to drop.
    */
  def loadBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write
      .partitionBy("_batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)

  /** The reference's load stage as a stream: watermark-deduped events
    * loaded to a warehouse parquet path per micro-batch via foreachBatch.
    * Exactly-once per event_id within the watermark horizon over an
    * at-least-once source: in-stream dropDuplicates kills source-level
    * replays, and `loadBatch`'s per-batch partition overwrite makes a
    * batch REPLAY (failure after a partial append, restart from the
    * checkpoint) idempotent rather than double-appending. The checkpoint
    * carries the dedup state across restarts.
    */
  def streamingLoad(events: DataFrame, path: String, checkpoint: String,
      watermark: String = "2 hours"): org.apache.spark.sql.streaming.StreamingQuery =
    dedupEvents(events, watermark)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        loadBatch(batch.toDF(), batchId, path)
      }
      .start()

  /** Streaming load into a [[graft.engine.VersionedTable]]: every
    * micro-batch publishes one SNAPSHOT VERSION keyed by its batchId —
    * `commitIfAbsent` makes an at-least-once batch replay a skipped
    * commit (the replay finds v=batchId already on disk), so the table
    * is exactly-once per batch AND time-travelable: a reader can pin
    * "the warehouse as of batch N" while the stream keeps appending
    * versions. The deduped-load counterpart with history instead of
    * partition overwrite.
    */
  def streamingSnapshotLoad(events: DataFrame, root: String, checkpoint: String,
      watermark: String = "2 hours"): org.apache.spark.sql.streaming.StreamingQuery =
    dedupEvents(events, watermark)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.engine.VersionedTable.commitIfAbsent(batch.toDF(), root, batchId): Unit
      }
      .start()

  /** Bounded catch-up: process EVERYTHING currently in the source in
    * rate-limited micro-batches (the source's own maxFilesPerTrigger /
    * maxOffsetsPerTrigger caps apply under AvailableNow, unlike the
    * legacy Trigger.Once), then STOP — the "drain the backlog without
    * OOMing on one giant batch, then hand back the cluster" mode a daily
    * catch-up or backfill-to-streaming migration runs. Same sink and
    * checkpoint as [[streamingLoad]], so catch-up runs and continuous
    * runs interleave safely on one table.
    */
  def streamingLoadCatchup(events: DataFrame, path: String, checkpoint: String,
      watermark: String = "2 hours"): org.apache.spark.sql.streaming.StreamingQuery =
    dedupEvents(events, watermark)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        loadBatch(batch.toDF(), batchId, path)
      }
      .start()

  /** Batch registration of the windowed aggregation over the `events`
    * table (same code path the stream runs).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_tumbling_hourly" -> ((s: SparkSession, dir: String) =>
      hourlyStats(Tables(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),
    "s06_sliding_hourly" -> ((s: SparkSession, dir: String) =>
      slidingStats(Tables(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),
    "s02_session_windows" -> ((s: SparkSession, dir: String) =>
      sessionStats(Tables(s, dir, "events"))
        .orderBy(col("session_start"), col("user_id"))),
    "s03_stream_interval_join" -> ((s: SparkSession, dir: String) => {
      val ev = Tables(s, dir, "events")
      clickViewJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
        .orderBy(col("click_id"), col("view_id"))
    }),
    "s07_stream_left_outer_join" -> ((s: SparkSession, dir: String) => {
      val ev = Tables(s, dir, "events")
      clickViewLeftJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
        .orderBy(col("click_id"), col("view_id"))
    }),
    "s08_stream_full_outer_join" -> ((s: SparkSession, dir: String) => {
      val ev = Tables(s, dir, "events")
      clickViewFullJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
        .orderBy(col("click_id"), col("view_id"))
    }),
    "s09_chained_windows" -> ((s: SparkSession, dir: String) =>
      chainedWindowStats(Tables(s, dir, "events"))
        .orderBy(col("day_start"), col("event_type"))),
    // stream-static enrichment graded in batch: the same enrichWithDim
    // the stream runs, keyed on user (events outside the dim keep the
    // left-join NULL segment), rolled up per segment x event_type
    "s05_stream_static_enrich" -> ((s: SparkSession, dir: String) => {
      val ev = Tables(s, dir, "events")
      val dim = Tables(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      enrichWithDim(ev, dim, "user_id")
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),
    // the dedup transform the streaming load runs, graded over a
    // simulated at-least-once source (every third event replayed)
    "s04_stream_dedup" -> ((s: SparkSession, dir: String) => {
      val ev = Tables(s, dir, "events")
      val replayed = ev.unionByName(ev.filter(col("event_id") % 3 === 0))
      val before = replayed.groupBy(col("event_type")).agg(count(lit(1)).as("n_raw"))
      val after = dedupEvents(replayed)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_deduped"))
      before.join(after, "event_type").orderBy(col("event_type"))
    }))

  /** DuckDB twins. `time_bucket` aligns to the same wall-clock hour
    * boundaries as Spark's `window`; session windows are rebuilt in SQL
    * with the lag-gap-flag + running-sum idiom (a new session starts when
    * the gap is >= 30 min, since Spark's session span is
    * `[first, last + gap)` half-open).
    */
  val oracles: Map[String, String] = Map(
    "s01_tumbling_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // each event belongs to the 4 sliding windows whose starts are the
    // last 4 quarter-hour boundaries at or before it — same epoch
    // alignment as Spark's window(ts, '1 hour', '15 minutes')
    "s06_sliding_hourly" ->
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
        |    event_type, user_id
        |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k)
        |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end, event_type,
        |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM e GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
    "s02_session_windows" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY session_start, user_id""".stripMargin,
    "s03_stream_interval_join" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |  v.event_id AS view_id, v.ts AS view_ts
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.ts >= v.ts AND c.ts - INTERVAL '30 minutes' <= v.ts
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |ORDER BY click_id, view_id""".stripMargin,
    "s07_stream_left_outer_join" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |  v.event_id AS view_id, v.ts AS view_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND c.ts >= v.ts AND c.ts - INTERVAL '30 minutes' <= v.ts
        |ORDER BY click_id, view_id""".stripMargin,
    "s08_stream_full_outer_join" ->
      """SELECT c.event_id AS click_id, c.ts AS click_ts,
        |  COALESCE(c.user_id, v.user_id) AS user_id,
        |  v.event_id AS view_id, v.ts AS view_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND c.ts >= v.ts AND c.ts - INTERVAL '30 minutes' <= v.ts
        |ORDER BY click_id, view_id""".stripMargin,
    "s05_stream_static_enrich" ->
      """SELECT c.c_mktsegment, e.event_type, count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin,
    "s09_chained_windows" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT CAST(date_trunc('day', hr) AS TIMESTAMP) AS day_start, event_type,
        |  CAST(sum(n) AS BIGINT) AS n_events_day, count(*) AS n_hours
        |FROM h GROUP BY 1, 2 ORDER BY day_start, event_type""".stripMargin,
    "s04_stream_dedup" ->
      """WITH replayed AS (
        |  SELECT * FROM events
        |  UNION ALL SELECT * FROM events WHERE event_id % 3 = 0)
        |SELECT event_type, count(*) AS n_raw,
        |  count(DISTINCT event_id) AS n_deduped
        |FROM replayed GROUP BY event_type ORDER BY event_type""".stripMargin)
}
