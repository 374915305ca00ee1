package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming CDC contract: serving from committed log snapshots
  * equals the x207 batch twin bitwise regardless of batch splits;
  * replayed batches never double-commit; compacting and then serving
  * an empty tail equals serving directly.
  */
class CdcIngestSpec extends SparkSpec {

  test("stateful compaction survives a late stale event; stateless compaction is the documented hazard") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_cdc_late").toString
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, String)]
    val q = CdcIngest.streamingCdcIngest(
      in.toDF().toDF("k", "v", "seq", "op"), s"$dirs/log", s"$dirs/ckpt")
    try {
      // batch 1: the NEW values and a delete arrive first
      in.addData((1L, "a9", 9L, "U"), (2L, "gone", 8L, "D"))
      q.processAllAvailable()
      // compact both ways at this point (the log truncation moment)
      val plain = CdcIngest.compact(spark, base, s"$dirs/log", "k")
      val stateful = CdcIngest.compactStateful(spark, base, s"$dirs/log", "k")
      // batch 2: LATE events older than everything already folded —
      // a stale update for 1 and a stale re-insert for deleted 2
      val late = Seq((1L, "stale", 3L, "U"), (2L, "zombie", 2L, "I"))
        .toDF("k", "v", "seq", "op")
      // stateless fold lost the seq watermark: the stale events win
      val corrupted = graft.engine.Cdc.applyCdc(plain, late, "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(corrupted === Set((1L, "stale"), (2L, "zombie")),
        "the hazard must actually manifest or the stateful form is untestable")
      // stateful fold kept it: late events lose, the delete holds
      val safe = graft.engine.Cdc.snapshot(
        graft.engine.Cdc.applyCdcStateful(stateful, late, "k"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(safe === Set((1L, "a9")))
      // and equals the one-shot apply of the WHOLE event history
      val all = Seq((1L, "a9", 9L, "U"), (2L, "gone", 8L, "D"),
        (1L, "stale", 3L, "U"), (2L, "zombie", 2L, "I"))
        .toDF("k", "v", "seq", "op")
      val oneShot = graft.engine.Cdc.applyCdc(base, all, "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(safe === oneShot)
    } finally q.stop()
  }

  test("streamed CDC serve equals the batch twin; replay and compact hold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val orders = graft.engine.Tables(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      .localCheckpoint(true)
    val base = orders.filter(pmod(col("o_orderkey"), lit(3L)) === 0L)
    // the same derived log as x207, as driver rows
    val events = (orders.filter(pmod(col("o_orderkey"), lit(3L)) === 1L)
        .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
          (col("o_orderkey") * 10 + 1).as("seq"), lit("I").as("op")) unionByName
      base.filter(pmod(col("o_orderkey"), lit(5L)) === 0L)
        .select(col("o_orderkey"), lit("S").as("o_orderstatus"),
          lit(0L).as("cents"), (col("o_orderkey") * 10).as("seq"),
          lit("I").as("op")) unionByName
      base.filter(pmod(col("o_orderkey"), lit(5L)) === 0L)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("cents") + 117L).as("cents"),
          (col("o_orderkey") * 10 + 2).as("seq"), lit("U").as("op")) unionByName
      base.filter(pmod(col("o_orderkey"), lit(15L)) === 0L)
        .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
          (col("o_orderkey") * 10 + 9).as("seq"), lit("D").as("op")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(_._4) // seq order across batch boundaries
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, Long, String)]
    val q = CdcIngest.streamingCdcIngest(
      in.toDF().toDF("o_orderkey", "o_orderstatus", "cents", "seq", "op"),
      s"$dirs/log", s"$dirs/ckpt")
    try {
      events.grouped((events.length + 2) / 3).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      val served = CdcIngest.serve(spark, base, s"$dirs/log", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
      val twin = graft.engine.Cdc.cdcApply(spark, Sf)
        .collect().map(_.toString).sorted.toSeq
      assert(served === twin, "streamed serve must equal the x207 batch twin")
      // replay
      graft.engine.VersionedTable.commitIfAbsent(
        spark.range(1).selectExpr("CAST(999 AS BIGINT) AS o_orderkey",
          "'Z' AS o_orderstatus", "CAST(0 AS BIGINT) AS cents",
          "CAST(1 AS BIGINT) AS seq", "'I' AS op"),
        s"$dirs/log", 0L)
      val after = CdcIngest.serve(spark, base, s"$dirs/log", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
      assert(after === twin, "replay must not alter the served table")
      // compact-then-serve (empty tail) == serve
      val compacted = CdcIngest.compact(spark, base, s"$dirs/log", "o_orderkey")
      val again = compacted.collect().map(_.toString).sorted.toSeq
      assert(again === twin)
    } finally q.stop()
  }
}
