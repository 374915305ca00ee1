package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Cdc
import graft.engine.Pin.PinOps

/** Streaming CDC ingest — the streaming form of x207's [[Cdc]]: each
  * micro-batch of I/U/D events commits as a [[VersionedTable]] log
  * snapshot keyed by batchId (`commitIfAbsent` → replay is a skipped
  * commit), and SERVING applies the union of committed log snapshots
  * to the base in one pass. Because apply is a per-key argmax over the
  * whole log, the batch boundaries are invisible: any split of the
  * events yields the same served table (CdcIngestSpec pins
  * streamed == x207's batch twin bitwise, plus replay).
  *
  * At cluster scale the served state is periodically COMPACTED — apply
  * once, commit the applied snapshot as the new base, truncate the log
  * (the standard log-structured pattern); `compact` below is that
  * fold, and compact-then-serve equals serve (also spec-pinned).
  */
object CdcIngest {

  /** Start the ingest: events stream (payload + seq + op) → one
    * committed log snapshot per batchId.
    */
  def streamingCdcIngest(events: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    SnapshotIngest.toVersioned(events, root, checkpoint)((batch, _) => batch)

  /** The lane's merge — plain union: a CDC log is append-only and
    * `applyCdc` is a whole-log per-key argmax, so any regrouping of
    * the events is invisible (associative, order-free).
    */
  val logFold: Seq[DataFrame] => DataFrame = _.reduce(_ unionByName _)

  /** [[streamingCdcIngest]] with self-compaction: once the live log
    * crosses `maxLiveVersions`, base+live fold into ONE log snapshot
    * (same rows, one version — the win is version/file metadata, not
    * row count; the served table is identical because apply is an
    * argmax over the union either way).
    */
  def streamingCdcIngestCompacting(events: DataFrame, root: String,
      checkpoint: String, maxLiveVersions: Int = 16): StreamingQuery =
    SnapshotIngest.toVersionedCompacting(events, root, checkpoint,
      maxLiveVersions)((batch, _) => batch)(logFold)

  /** The committed log at a point in time: the compacted base (if a
    * fold happened) plus every live version — identical to the plain
    * union of all committed snapshots by the fold's associativity.
    */
  def logFromSnapshots(s: SparkSession, root: String): DataFrame =
    SnapshotIngest.standing(s, root)(logFold)

  /** Serve: apply the committed log to the base. */
  def serve(s: SparkSession, base: DataFrame, root: String,
      key: String): DataFrame =
    Cdc.applyCdc(base, logFromSnapshots(s, root), key)

  /** Compaction: fold the log into the base once; the result is the
    * new base and the log can truncate. Idempotent with serve by
    * construction (apply is an argmax — CdcIngestSpec pins it).
    * ONLY safe when no event below the folded log's horizon can still
    * arrive — the fold discards per-key seq state, so a late stale
    * event applied afterwards would wrongly win (the x208 hazard).
    * Feeds with out-of-order delivery across the compaction point use
    * [[compactStateful]].
    */
  def compact(s: SparkSession, base: DataFrame, root: String,
      key: String): DataFrame =
    serve(s, base, root, key).pinned

  /** Late-safe compaction: fold the committed log into CDC STATE
    * (per-key applied (seq, op) watermark + tombstones — x208's
    * [[Cdc.applyCdcStateful]]), keeping the metadata columns in the
    * compacted result. Events arriving after the fold — including
    * events OLDER than anything already folded — apply against the
    * watermark and cannot regress a row or resurrect a delete;
    * `Cdc.snapshot` is the readable table. CdcIngestSpec pins the
    * hazard both ways: the stateless fold corrupts under a late stale
    * event, the stateful fold matches the one-shot whole-log apply.
    */
  def compactStateful(s: SparkSession, base: DataFrame, root: String,
      key: String): DataFrame =
    Cdc.applyCdcStateful(Cdc.initState(base),
      logFromSnapshots(s, root), key).pinned

  // -- stateful self-compaction with tombstone retention -----------------
  //
  // The log-fold lane above compacts VERSIONS (base = one log snapshot
  // holding every event ever) — right when history must be replayable,
  // wrong as the steady-state footprint of a year-long feed: O(events).
  // The stateful fold below compacts the log INTO CDC STATE: one row
  // per live key plus tombstones, i.e. O(live keys + recent deletes).
  // Tombstones then expire once the feed's lateness horizon passes —
  // WITHOUT retention the state still grows by every key ever deleted,
  // the one unbounded term left. Retention is sound only because the
  // fold gates incoming events at the same horizon (Cdc.expireTombstones
  // docs); a contract-violating stale event below the horizon is
  // dropped, never applied, so the missing tombstone has nothing to
  // lose to. The BASE is baked into the state at the first fold (the
  // init frame), which is what makes expiry safe against base rows too:
  // after the fold nothing ever re-reads the raw base, so an expired
  // delete cannot resurrect through it.

  /** Lateness horizon of a state frame: its max applied `_seq` minus
    * the allowed lateness — events and tombstones below it are outside
    * the feed's delivery contract. MinValue (never gate / never expire)
    * until a first real event lands.
    */
  private def horizonOf(state: DataFrame, allowedLateness: Long): Long = {
    import org.apache.spark.sql.functions.{col, max}
    val maxSeq = state.agg(max(col("_seq"))).head().get(0)
      .asInstanceOf[java.lang.Long]
    if (maxSeq == null || maxSeq.longValue() == Long.MinValue) Long.MinValue
    else {
      val h = maxSeq.longValue() - allowedLateness
      if (h > maxSeq.longValue()) Long.MinValue else h // saturate underflow
    }
  }

  /** The stateful lane's merge for [[SnapshotIngest]]: fold raw log
    * versions into CDC state rooted at `base`, gating events and
    * expiring tombstones at the lateness horizon. State frames are
    * recognized by their `_tombstone` column (at most one — the lane's
    * own previous fold); everything else is raw log. Associative under
    * the lateness contract: any batch regrouping of in-contract events
    * folds to the same state (the x208 argmax invariance, gate
    * included — CdcRetentionSpec pins fold == one-shot).
    */
  def stateFold(base: DataFrame, key: String, allowedLateness: Long)(
      frames: Seq[DataFrame]): DataFrame = {
    val (states, logs) = frames.partition(_.columns.contains("_tombstone"))
    require(states.size <= 1,
      s"CdcIngest.stateFold: expected at most one state frame, got ${states.size}")
    val state0 = states.headOption.getOrElse(Cdc.initState(base))
    val folded = logs.reduceOption(_ unionByName _) match {
      case None => state0
      case Some(log) =>
        Cdc.applyCdcStateful(state0, log, key,
          horizonOf(state0, allowedLateness))
    }
    Cdc.expireTombstones(folded, horizonOf(folded, allowedLateness))
      .pinned
  }

  /** [[streamingCdcIngestCompacting]] with the STATEFUL fold: the lane
    * self-compacts into CDC state (not a replayable log) and retains
    * tombstones only within `allowedLateness` of the newest applied
    * sequence — the retention knob. Footprint: O(live keys + deletes
    * within the lateness window), flat under delete-heavy feeds.
    */
  def streamingCdcIngestCompactingStateful(events: DataFrame,
      base: DataFrame, key: String, root: String, checkpoint: String,
      maxLiveVersions: Int = 16,
      allowedLateness: Long = Long.MaxValue / 4): StreamingQuery =
    SnapshotIngest.toVersionedCompacting(events, root, checkpoint,
      maxLiveVersions)((batch, _) => batch)(
      stateFold(base, key, allowedLateness))

  /** Serve the stateful compacting lane: the standing CDC state's
    * readable snapshot.
    */
  def serveStateful(s: SparkSession, base: DataFrame, root: String,
      key: String, allowedLateness: Long = Long.MaxValue / 4): DataFrame =
    Cdc.snapshot(SnapshotIngest.standing(s, root)(
      stateFold(base, key, allowedLateness)))

  // streaming-only lane: correctness pinned by CdcIngestSpec
  // (served == x207 batch twin; replay no-op; compact-then-serve ==
  // serve); the merge algebra is hash-gated via x207. The stateful
  // retention lane is pinned by CdcRetentionSpec.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  val oracles: Map[String, String] = Map.empty
}
