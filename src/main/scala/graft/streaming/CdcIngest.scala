package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Cdc

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
    serve(s, base, root, key).localCheckpoint(true)

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
      logFromSnapshots(s, root), key).localCheckpoint(true)

  // streaming-only lane: correctness pinned by CdcIngestSpec
  // (served == x207 batch twin; replay no-op; compact-then-serve ==
  // serve); the merge algebra is hash-gated via x207.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  val oracles: Map[String, String] = Map.empty
}
