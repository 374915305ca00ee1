package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Cdc

/** Tombstone retention for the stateful self-compacting CDC lane — the
  * round-15 verdict's unbounded-term closure. Pins exactly the three
  * claims the design rests on:
  *
  *   (a) a late stale insert BELOW the lateness horizon cannot
  *       resurrect a key whose tombstone already expired — the horizon
  *       gate discards the event before the apply ever sees it;
  *   (b) state row count is BOUNDED under a delete-heavy replay: the
  *       footprint is live keys + tombstones within the lateness
  *       window, not every key ever deleted;
  *   (c) the gated+expiring fold of any batch decomposition equals the
  *       one-shot whole-log stateful apply whenever the feed honors its
  *       lateness contract (and the default knob = retention off
  *       changes nothing, so x207/x208 semantics are untouched).
  */
class CdcRetentionSpec extends SparkSpec {

  import spark.implicits._

  private def state(rows: DataFrame): Set[(Long, String)] =
    Cdc.snapshot(rows).collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("(a) expired tombstone + gated late insert: the deleted key stays deleted") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val st0 = Cdc.initState(base)
    // delete key 2 at seq 10, bump key 1 at seq 100
    val log1 = Seq((2L, "x", 10L, "D"), (1L, "a2", 100L, "U"))
      .toDF("k", "v", "seq", "op")
    val applied = Cdc.applyCdcStateful(st0, log1, "k")
    // lateness horizon 50: the feed promises nothing below seq 50 again
    val retained = Cdc.expireTombstones(applied, 50L)
    assert(retained.filter(col("_tombstone")).count() === 0L,
      "the seq-10 tombstone is below the horizon and must expire")
    // the contract-violating stale insert for the deleted key
    val zombie = Seq((2L, "zombie", 20L, "I")).toDF("k", "v", "seq", "op")
    // WITHOUT the gate the hazard is real (the spec must prove the
    // danger exists, or the gate is untestable): no tombstone to lose
    // to, the stale insert wins
    val unguarded = Cdc.applyCdcStateful(retained, zombie, "k")
    assert(state(unguarded).contains((2L, "zombie")),
      "sanity: expiry without the gate WOULD resurrect — the gate is load-bearing")
    // WITH the gate at the same horizon: dropped before the apply
    val guarded = Cdc.applyCdcStateful(retained, zombie, "k", minSeqHorizon = 50L)
    assert(state(guarded) === Set((1L, "a2")),
      "a gated stale insert below the horizon must not resurrect the key")
  }

  test("(b) delete-heavy replay: state stays O(live keys + lateness window)") {
    val base = Seq((0L, "seed")).toDF("k", "v")
    // 40 batches; each inserts key b at seq 10b and deletes it at 10b+5
    // — every key is dead by the end except the last insert wave
    var st = Cdc.initState(base).localCheckpoint(true)
    val lateness = 25L // two batches' worth of seq room
    (1 to 40).foreach { b =>
      val log = Seq((b.toLong, s"v$b", b * 10L, "I"),
        (b.toLong, s"v$b", b * 10L + 5L, "D")).toDF("k", "v", "seq", "op")
      val applied = Cdc.applyCdcStateful(st, log, "k",
        minSeqHorizon = b * 10L - lateness)
      st = Cdc.expireTombstones(applied, b * 10L + 5L - lateness)
        .localCheckpoint(true)
    }
    val rows = st.count()
    // live: the seed key; tombstones: only deletes within the last
    // `lateness` seqs survive (~3). WITHOUT retention this is 41 rows.
    assert(rows <= 5L,
      s"retention must bound the state (got $rows rows; unbounded would be 41)")
    assert(state(st) === Set((0L, "seed")),
      "every inserted key was deleted — only the seed survives")
  }

  test("(c) gated fold of batches == one-shot apply under the lateness contract") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // an in-contract event stream: per-key out-of-order WITHIN batches,
    // but nothing arrives more than `lateness` below the running max
    val events = Seq(
      (1L, "a1", 10L, "U"), (2L, "b1", 12L, "U"),
      (3L, "gone", 15L, "D"), (1L, "a2", 14L, "U"), // late vs 15, in window
      (2L, "b2", 22L, "U"), (1L, "stale", 11L, "U"), // late vs 22, in window
      (4L, "d1", 30L, "I"), (3L, "zombie", 13L, "I")) // 13 < 30-16? no: window 20
    val lateness = 20L
    val oneShot = Cdc.snapshot(Cdc.applyCdcStateful(
      Cdc.initState(base), events.toDF("k", "v", "seq", "op"), "k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // fold in 4 batches of 2 through the retention path
    var st = Cdc.initState(base).localCheckpoint(true)
    events.grouped(2).foreach { g =>
      val applied = Cdc.applyCdcStateful(st,
        g.toDF("k", "v", "seq", "op"), "k",
        minSeqHorizon = CdcIngestTestHook.horizonOf(st, lateness))
      st = Cdc.expireTombstones(applied,
        CdcIngestTestHook.horizonOf(applied, lateness)).localCheckpoint(true)
    }
    assert(state(st) === oneShot,
      "any batch decomposition of an in-contract feed must fold to the one-shot state")
    // and x208's own invariant is untouched by the DEFAULT knob:
    // gate at MinValue + expire at MinValue is the identity pipeline
    val ungated = Cdc.applyCdcStateful(Cdc.initState(base),
      events.toDF("k", "v", "seq", "op"), "k", minSeqHorizon = Long.MinValue)
    assert(state(Cdc.expireTombstones(ungated, Long.MinValue)) === oneShot)
  }

  test("the streaming lane folds to bounded state and serves the argmax truth") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_cdc_ret").toString
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, String)]
    // maxLiveVersions=2 → folds happen mid-stream; lateness 100 keeps
    // every tombstone in-window at this scale (boundedness is (b)'s job)
    val q = CdcIngest.streamingCdcIngestCompactingStateful(
      in.toDF().toDF("k", "v", "seq", "op"), base, "k",
      s"$dirs/log", s"$dirs/ckpt", maxLiveVersions = 2,
      allowedLateness = 100L)
    try {
      val batches = Seq(
        Seq((1L, "a1", 10L, "U"), (3L, "c1", 11L, "I")),
        Seq((2L, "gone", 12L, "D"), (3L, "c2", 14L, "U")),
        Seq((1L, "a2", 20L, "U"), (4L, "d1", 21L, "I")))
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      assert(SnapshotIngest.horizon(spark, s"$dirs/log").isDefined,
        "three batches over maxLiveVersions=2 must have folded")
      val served = CdcIngest.serveStateful(spark, base, s"$dirs/log", "k",
        allowedLateness = 100L)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val oneShot = Cdc.applyCdc(base,
        batches.flatten.toDF("k", "v", "seq", "op"), "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(served === oneShot,
        "the folded-and-served state must equal the whole-log apply")
    } finally q.stop()
  }
}

/** Test seam re-exporting the lane's private horizon arithmetic so the
  * spec folds with the exact production gate.
  */
object CdcIngestTestHook {
  def horizonOf(state: DataFrame, allowedLateness: Long): Long = {
    val maxSeq = state.agg(max(col("_seq"))).head().get(0)
      .asInstanceOf[java.lang.Long]
    if (maxSeq == null || maxSeq.longValue() == Long.MinValue) Long.MinValue
    else {
      val h = maxSeq.longValue() - allowedLateness
      if (h > maxSeq.longValue()) Long.MinValue else h
    }
  }
}
