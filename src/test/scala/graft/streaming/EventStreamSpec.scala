package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drives the streaming transforms through MemoryStream micro-batches:
  * watermark-closed windows match the batch computation, late data is
  * dropped, duplicate ids collapse, and keyed state accumulates across
  * batches.
  */
class EventStreamSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Per-operator state-size report for the backend-parameterized
    * stateful tests, plus proof the requested backend actually engaged:
    * under RocksDB every stateful operator exposes rocksdb* custom
    * metrics — their absence would mean the conf silently didn't bind.
    */
  private def reportState(q: org.apache.spark.sql.streaming.StreamingQuery,
      backend: String): Unit = {
    import scala.jdk.CollectionConverters._
    val ops = Option(q.lastProgress).map(_.stateOperators.toSeq).getOrElse(Seq.empty)
    assert(ops.nonEmpty, "stateful query must report state operators")
    ops.foreach { op =>
      info(s"[$backend] ${op.operatorName}: rows=${op.numRowsTotal} " +
        s"mem=${op.memoryUsedBytes}B")
    }
    if (backend == "rocksdb")
      ops.foreach { op =>
        assert(op.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")),
          s"${op.operatorName} must run on the RocksDB state store")
      }
  }

  test("watermarked tumbling windows finalize and match batch; late data dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.hourlyStatsStream(df)
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 3.0),
        (ts("2024-01-01 11:10:00"), "view", 2.0))
      q.processAllAvailable()
      // watermark is still behind -> nothing finalized yet
      assert(spark.table("hourly").isEmpty)
      // an event far ahead advances the watermark past hours 10 and 11
      in.addData((ts("2024-01-01 15:00:00"), "click", 9.0))
      q.processAllAvailable()
      // a late event inside hour 10 — beyond the watermark, must be dropped
      in.addData((ts("2024-01-01 10:50:00"), "click", 100.0))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select("window_start", "event_type", "n_events", "max_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 2.0)))
    } finally q.stop()
  }

  test("watermarked sliding windows emit all four slides per event") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.slidingCountsStream(df)
      .writeStream.format("memory").queryName("sliding").outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 3.0),
        (ts("2024-01-01 11:10:00"), "view", 2.0))
      q.processAllAvailable()
      // far-future event advances the watermark; all earlier windows close
      in.addData((ts("2024-01-01 15:00:00"), "click", 9.0))
      q.processAllAvailable()
      val got = spark.table("sliding")
        .select("window_start", "event_type", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val expected = Set(
        (ts("2024-01-01 09:15:00"), "click", 1L),
        (ts("2024-01-01 09:30:00"), "click", 1L),
        (ts("2024-01-01 09:45:00"), "click", 2L),
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 10:15:00"), "click", 1L),
        (ts("2024-01-01 10:30:00"), "click", 1L),
        (ts("2024-01-01 10:15:00"), "view", 1L),
        (ts("2024-01-01 10:30:00"), "view", 1L),
        (ts("2024-01-01 10:45:00"), "view", 1L),
        (ts("2024-01-01 11:00:00"), "view", 1L))
      assert(got == expected, s"got $got")
      // batch spelling agrees on the same closed windows
      val batch = EventStream.slidingStats(
        Seq((ts("2024-01-01 10:05:00"), "click", 1.0),
          (ts("2024-01-01 10:40:00"), "click", 3.0),
          (ts("2024-01-01 11:10:00"), "view", 2.0))
          .toDF("ts", "event_type", "value").withColumn("user_id", lit(1L)))
        .select("window_start", "event_type", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(batch == expected)
    } finally q.stop()
  }

  // the stateful family runs under BOTH state-store backends: the
  // default heap-backed provider and RocksDB (the at-scale choice when
  // state outgrows executor memory) — same inputs, same outputs, plus a
  // per-operator state-size report
  for (backend <- Seq("hdfs", "rocksdb"))
  test(s"timeout sessions close on watermark and split in-batch gaps [$backend]") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    StateBackend.withBackend(spark, backend) {
    val in = MemoryStream[EventStream.UserEvent]
    val q = EventStream.timeoutSessions(in.toDS())
      .writeStream.format("memory").queryName(s"tsessions_$backend")
      .outputMode("append").start()
    try {
      // one batch containing TWO sessions for user 1 (gap > 30 min):
      // the first must close immediately from the in-batch fold
      in.addData(
        EventStream.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        EventStream.UserEvent(1L, ts("2024-01-01 10:10:00"), 2.0),
        EventStream.UserEvent(1L, ts("2024-01-01 12:00:00"), 3.0),
        EventStream.UserEvent(2L, ts("2024-01-01 12:05:00"), 4.0))
      q.processAllAvailable()
      val afterBatch = spark.table(s"tsessions_$backend")
        .as[EventStream.ClosedSession].collect().toSet
      assert(afterBatch == Set(
        EventStream.ClosedSession(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L)))
      // advancing the watermark past 12:00/12:05 + gap times out the
      // remaining state; both idle sessions close exactly once
      in.addData(EventStream.UserEvent(3L, ts("2024-01-01 15:00:00"), 5.0))
      q.processAllAvailable()
      in.addData(EventStream.UserEvent(3L, ts("2024-01-01 15:01:00"), 6.0))
      q.processAllAvailable()
      val closed = spark.table(s"tsessions_$backend")
        .as[EventStream.ClosedSession].collect().toSet
      assert(closed.contains(
        EventStream.ClosedSession(1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1L)))
      assert(closed.contains(
        EventStream.ClosedSession(2L, ts("2024-01-01 12:05:00"), ts("2024-01-01 12:05:00"), 1L)))
      assert(closed.count(_.user_id == 1L) == 2, "each session closes exactly once")
      reportState(q, backend)
    } finally q.stop()
    }
  }

  test("timeout sessions survive events arriving entirely behind the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventStream.UserEvent]
    val q = EventStream.timeoutSessions(in.toDS())
      .writeStream.format("memory").queryName("latesessions").outputMode("append").start()
    try {
      // advance the watermark to ~14:30 (15:00 - 30 min gap)
      in.addData(EventStream.UserEvent(3L, ts("2024-01-01 15:00:00"), 1.0))
      q.processAllAvailable()
      in.addData(EventStream.UserEvent(3L, ts("2024-01-01 15:01:00"), 2.0))
      q.processAllAvailable()
      // an at-least-once replay: user 9's event at 10:00 has
      // ts + gap = 10:30 <= watermark. Spark 4.1's
      // FlatMapGroupsWithStateExec applies the late-events watermark
      // filter to INPUT rows, so the replay is dropped before the state
      // function — the query must keep running (the setTimeoutTimestamp
      // clamp in timeoutSessions additionally guards the restart edge
      // where the eviction watermark runs ahead of the late-events one)
      in.addData(EventStream.UserEvent(9L, ts("2024-01-01 10:00:00"), 3.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died on a late replay: ${q.exception}")
      in.addData(EventStream.UserEvent(3L, ts("2024-01-01 15:02:00"), 4.0))
      q.processAllAvailable()
      in.addData(EventStream.UserEvent(3L, ts("2024-01-01 15:03:00"), 5.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died after the late replay: ${q.exception}")
      val late = spark.table("latesessions").as[EventStream.ClosedSession]
        .collect().filter(_.user_id == 9L)
      assert(late.isEmpty,
        "a fully-late replay is watermark-filtered, never a crash or a duplicate")
    } finally q.stop()
  }

  test("StreamObserver records per-batch progress and flags slow batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val slow = scala.collection.mutable.ListBuffer.empty[StreamObserver.BatchProgress]
    val obs = new StreamObserver(spark, slowBatchMs = -1, onSlowBatch = slow += _).attach()
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = in.toDF().toDF("ts", "event_type", "value")
      .writeStream.format("memory").queryName("observed").outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), "click", 1.0),
        (ts("2024-01-01 10:01:00"), "view", 2.0))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 10:02:00"), "click", 3.0))
      q.processAllAvailable()
      // listener delivery is async; wait for the data-carrying batches
      val deadline = System.currentTimeMillis() + 30000
      def recorded() = obs.progress()
        .filter(col("query") === "observed" && col("input_rows") > 0).collect()
      while (recorded().map(_.getAs[Long]("input_rows")).sum < 3
        && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val rows = recorded()
      assert(rows.map(_.getAs[Long]("input_rows")).sum == 3,
        s"all input rows accounted in progress, got ${rows.mkString(",")}")
      // every batch exceeds the -1 ms budget -> the alert hook saw them all
      assert(slow.synchronized(slow.count(r => r.query == "observed" && r.input_rows > 0)) >= 2)
    } finally { q.stop(); obs.detach() }
  }

  test("dropDuplicatesWithinWatermark collapses replays inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = df.writeStream.format("memory").queryName("wmdedup").outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      // replay with a slightly different ts (the at-least-once reality
      // dropDuplicatesWithinWatermark exists for) plus a fresh event
      in.addData((1L, ts("2024-01-01 10:05:00"), "click"),
        (2L, ts("2024-01-01 10:06:00"), "view"))
      q.processAllAvailable()
      val ids = spark.table("wmdedup").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L)), s"replayed id must emit once, got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("streaming dropDuplicates collapses repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.dedupEvents(df)
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 10:01:00"), "click"), (2L, ts("2024-01-01 10:02:00"), "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventStream.UserEvent]
    val q = EventStream.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      in.addData(
        EventStream.UserEvent(7L, ts("2024-01-01 10:00:00"), 1.5),
        EventStream.UserEvent(8L, ts("2024-01-01 10:01:00"), 4.0))
      q.processAllAvailable()
      in.addData(EventStream.UserEvent(7L, ts("2024-01-01 10:05:00"), 9.5))
      q.processAllAvailable()
      val finalPerUser = spark.table("running")
        .groupBy("user_id").agg(max("n_events").as("n"), max("max_value").as("mx"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(finalPerUser == Map(7L -> ((2L, 9.5)), 8L -> ((1L, 4.0))))
    } finally q.stop()
  }

  test("streamingLoad appends exactly-once per event id into the sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_streamload").toString
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.streamingLoad(df, s"$dir/events", s"$dir/ckpt")
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      // a replay of id 1 plus a new id — at-least-once source
      in.addData((1L, ts("2024-01-01 10:00:30"), "click"), (2L, ts("2024-01-01 10:01:00"), "view"))
      q.processAllAvailable()
      val loaded = spark.read.parquet(s"$dir/events")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(loaded == Seq(1L, 2L), "duplicate replay must not double-load")
    } finally q.stop()
  }

  for (backend <- Seq("hdfs", "rocksdb"))
  test(s"left-outer stream join emits unmatched clicks with a null view after the watermark [$backend]") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    StateBackend.withBackend(spark, backend) {
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val viewsIn = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStream.clickViewLeftJoin(
      clicksIn.toDF().toDF("event_id", "user_id", "ts"),
      viewsIn.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName(s"leftattrib_$backend")
      .outputMode("append").start()
    try {
      // user 7 clicks with a matching view; user 9 clicks with NO view
      viewsIn.addData((100L, 7L, ts("2024-01-01 10:00:00")))
      clicksIn.addData(
        (1L, 7L, ts("2024-01-01 10:10:00")),
        (2L, 9L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // push BOTH watermarks far past click 2's join window (watermark
      // advances at batch end, applies next batch), then one more batch
      // so state eviction emits the null-extended row
      viewsIn.addData((101L, 8L, ts("2024-01-01 14:00:00")))
      clicksIn.addData((3L, 8L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      viewsIn.addData((102L, 8L, ts("2024-01-01 15:00:00")))
      clicksIn.addData((4L, 8L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val rows = spark.table(s"leftattrib_$backend")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      val byClick = rows.groupBy(_._1)
      assert(byClick(1L).toSeq == Seq((1L, Some(100L))), "matched click joins its view")
      assert(byClick(2L).toSeq == Seq((2L, None)),
        s"unmatched click emits EXACTLY once with a null view: ${rows.toSeq}")
      reportState(q, backend)
    } finally q.stop()
    }
  }

  for (backend <- Seq("hdfs", "rocksdb"))
  test(s"chained window aggregation finalizes daily rollups from hourly state [$backend]") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    StateBackend.withBackend(spark, backend) {
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStream.chainedWindowStatsStream(df)
      .writeStream.format("memory").queryName(s"chained_$backend")
      .outputMode("append").start()
    try {
      // three events across two hours of day 1
      in.addData(
        (1L, ts("2024-01-01 10:10:00"), "click", 1.0),
        (2L, ts("2024-01-01 10:40:00"), "click", 1.0),
        (3L, ts("2024-01-01 11:20:00"), "click", 1.0))
      q.processAllAvailable()
      // push the watermark past day 1 end so hourly AND daily finalize
      in.addData((9L, ts("2024-01-02 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      in.addData((10L, ts("2024-01-03 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table(s"chained_$backend")
        .select("day_start", "event_type", "n_events_day", "n_hours").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 3L, 2L)),
        s"day 1 must finalize as 3 events over 2 hourly windows: ${rows.toSeq}")
      assert(rows.count(_._1 == "2024-01-01 00:00:00.0") == 1, "finalized exactly once")
      reportState(q, backend)
    } finally q.stop()
    }
  }

  test("full-outer stream join emits orphan views with a null click after the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val viewsIn = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStream.clickViewFullJoin(
      clicksIn.toDF().toDF("event_id", "user_id", "ts"),
      viewsIn.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("fullattrib").outputMode("append").start()
    try {
      // user 7: matched pair; user 9: orphan VIEW (no click ever)
      viewsIn.addData(
        (100L, 7L, ts("2024-01-01 10:00:00")),
        (101L, 9L, ts("2024-01-01 10:00:00")))
      clicksIn.addData((1L, 7L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      Seq(14, 15).foreach { h =>
        viewsIn.addData((200L + h, 8L, ts(f"2024-01-01 $h%02d:00:00")))
        clicksIn.addData((10L + h, 8L, ts(f"2024-01-01 $h%02d:00:00")))
        q.processAllAvailable()
      }
      val rows = spark.table("fullattrib")
        .select("click_id", "user_id", "view_id").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      assert(rows.contains((Some(1L), 7L, Some(100L))), s"matched pair emits: ${rows.toSeq}")
      assert(rows.count(_ == ((None, 9L, Some(101L)))) == 1,
        s"orphan view emits EXACTLY once with a null click: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streamingLoad restarts from its checkpoint: no re-load, replays deduped") {
    // The kill-and-resume contract (a file source is recoverable across
    // restarts, unlike MemoryStream): run, stop, land a new file that
    // REPLAYS an already-loaded id while the query is down, restart on
    // the same checkpoint. The checkpoint must (a) remember file A so it
    // is never re-loaded, and (b) carry the dedup state so the replayed
    // id stays exactly-once; loadBatch's _batch_id partition overwrite
    // keeps any redelivered batch idempotent.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckptrec").toString
    val src = s"$dir/in"
    new java.io.File(src).mkdirs()
    val schema = "event_id LONG, ts TIMESTAMP, event_type STRING"
    def start() = EventStream.streamingLoad(
      spark.readStream.schema(schema).json(src), s"$dir/events", s"$dir/ckpt")
    def land(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(src, name))
    }
    land("a.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","event_type":"click"}""",
      """{"event_id":2,"ts":"2024-01-01T10:01:00.000Z","event_type":"view"}"""))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // down. A replay of id 2 plus a genuinely new id 3 arrives.
    land("b.json", Seq(
      """{"event_id":2,"ts":"2024-01-01T10:01:30.000Z","event_type":"view"}""",
      """{"event_id":3,"ts":"2024-01-01T10:02:00.000Z","event_type":"click"}"""))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val loaded = spark.read.parquet(s"$dir/events")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(loaded == Seq(1L, 2L, 3L),
      s"restart must neither re-load file A nor double-load the replayed id: $loaded")
  }

  test("streamingSnapshotLoad publishes one version per batch; replays skip") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.engine.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_snapload").toString
    val root = s"$dir/table"
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.streamingSnapshotLoad(df, root, s"$dir/ckpt")
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      in.addData((2L, ts("2024-01-01 10:01:00"), "view"))
      q.processAllAvailable()
      val vs = VersionedTable.versions(spark, root)
      assert(vs.size >= 2, s"each micro-batch publishes a snapshot: $vs")
      // a foreachBatch REPLAY of an already-committed batch is skipped
      val replay = Seq((1L, "replay")).toDF("event_id", "v")
      assert(!VersionedTable.commitIfAbsent(replay, root, vs.head),
        "replayed batchId must not re-commit")
      assert(VersionedTable.versions(spark, root) == vs, "history unchanged")
      // time travel: the first batch's snapshot still reads as written
      val v0 = VersionedTable.read(spark, root, Some(vs.head))
        .select("event_id").collect().map(_.getLong(0)).toSeq
      assert(v0 == Seq(1L))
    } finally q.stop()
  }

  test("AvailableNow catch-up drains a backlog in bounded batches, then stops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_catchup").toString
    val src = s"$dir/in"
    new java.io.File(src).mkdirs()
    val schema = "event_id LONG, ts TIMESTAMP, event_type STRING"
    (1 to 3).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(src, s"f$i.json"),
        s"""{"event_id":$i,"ts":"2024-01-01T10:0$i:00.000Z","event_type":"click"}""".getBytes)
    }
    val q = EventStream.streamingLoadCatchup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src),
      s"$dir/events", s"$dir/ckpt")
    assert(q.awaitTermination(120000), "AvailableNow must terminate on its own")
    val out = spark.read.parquet(s"$dir/events")
    val ids = out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), "backlog fully drained exactly once")
    // rate cap respected: the 3-file backlog processed as multiple batches
    val nBatches = out.select("_batch_id").distinct().count()
    assert(nBatches >= 3, s"maxFilesPerTrigger=1 must bound each batch: $nBatches")
  }

  test("loadBatch replay overwrites its own partition instead of appending") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_batchload").toString
    val path = s"$dir/events"
    val b0 = Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
    EventStream.loadBatch(b0, 0L, path)
    EventStream.loadBatch(Seq((3L, "click")).toDF("event_id", "event_type"), 1L, path)
    // simulate a foreachBatch replay of batch 0 after a failure
    EventStream.loadBatch(b0, 0L, path)
    val ids = spark.read.parquet(path).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), "batch replay must be idempotent")
  }

  test("stream-stream interval join matches views inside the lookback only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val viewsIn = MemoryStream[(Long, Long, Timestamp)]
    val clicks = clicksIn.toDF().toDF("event_id", "user_id", "ts")
    val views = viewsIn.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStream.clickViewJoin(clicks, views)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      viewsIn.addData(
        (100L, 7L, ts("2024-01-01 10:00:00")), // 10 min before the click: in window
        (101L, 7L, ts("2024-01-01 09:30:00")), // 40 min before: outside lookback
        (102L, 8L, ts("2024-01-01 10:05:00"))) // other user
      clicksIn.addData((1L, 7L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 100L)),
        "only the same-user view inside the 30-minute lookback matches")
    } finally q.stop()
  }

  test("stream-static join enriches micro-batches from the broadcast dim") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(("click", "interaction"), ("view", "impression")).toDF("event_type", "category")
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("event_id", "event_type")
    val q = EventStream.enrichWithDim(df, dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      in.addData((1L, "click"), (2L, "view"), (3L, "purchase"))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("event_id", "category").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("interaction"), 2L -> Some("impression"), 3L -> None))
    } finally q.stop()
  }

  test("stream-static enrichment joins the dim into every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(("click", "interactive"), ("view", "passive"))
      .toDF("event_type", "category")
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("event_id", "event_type")
    val q = EventStream.enrichWithDim(df, dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      in.addData((1L, "click"), (2L, "view"))
      q.processAllAvailable()
      in.addData((3L, "signup")) // no dim row -> left join keeps it with NULL
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("event_id", "category").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got == Set(
        (1L, Some("interactive")), (2L, Some("passive")), (3L, None)))
    } finally q.stop()
  }

  test("session windows split on the gap") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")),
      (2L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val got = EventStream.sessionStats(df, "30 minutes")
      .collect().map(r => (r.getLong(2), r.getTimestamp(0), r.getLong(3))).toSet
    assert(got == Set(
      (1L, ts("2024-01-01 10:00:00"), 2L),
      (1L, ts("2024-01-01 11:30:00"), 1L),
      (2L, ts("2024-01-01 10:00:00"), 1L)))
  }
}
