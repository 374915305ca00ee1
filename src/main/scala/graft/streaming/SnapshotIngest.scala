package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.VersionedTable

/** The one snapshot-ingest runner every streaming lane shares: a
  * micro-batch stream whose each batch derives a snapshot and commits
  * it as a [[VersionedTable]] version keyed by batchId.
  * `commitIfAbsent` turns Structured Streaming's at-least-once
  * foreachBatch into exactly-once publication — a replayed batch finds
  * its version already on disk and skips (every lane's spec pins the
  * replay no-op through this same code path now).
  *
  * Lanes differ only in `derive` (corpus accept-filter, tf partials,
  * graph insert-edges, IVF-PQ codes, …) and, for the multi-root lanes
  * (ViewIngest, ServingIngest), in committing more than one artifact —
  * those use [[run]] and keep their per-root commitIfAbsent calls.
  */
object SnapshotIngest {

  /** Start a foreachBatch stream with the shared checkpoint wiring. */
  def run(events: DataFrame, checkpoint: String)(
      body: (DataFrame, Long) => Unit): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        body(batch.toDF(), batchId)
      }
      .start()

  /** The standard single-root lane: commit `derive(batch, batchId)` at
    * version batchId under `root`, exactly-once under replay.
    */
  def toVersioned(events: DataFrame, root: String, checkpoint: String)(
      derive: (DataFrame, Long) => DataFrame): StreamingQuery =
    run(events, checkpoint) { (batch, batchId) =>
      VersionedTable.commitIfAbsent(derive(batch, batchId), root, batchId): Unit
    }

  // -- self-compacting lanes ---------------------------------------------
  //
  // A long-running lane commits one snapshot per micro-batch forever;
  // after a week that is thousands of tiny versions whose union is
  // million-file metadata pressure on every standing read. Compaction
  // folds them — but it must NOT publish into the batchId keyspace: a
  // compacted snapshot committed at max+1 would occupy a FUTURE batch's
  // version, and that batch's commitIfAbsent would silently skip — data
  // loss. So the fold lives in its own VersionedTable at `<root>/_base`,
  // and the base VERSION NUMBER is the fold HORIZON: base v=H holds the
  // fold of every log version <= H. That one invariant buys exactness
  // through every crash window with no extra bookkeeping:
  //   - crash after base commit, before log drops: the leftovers are
  //     <= horizon, excluded from every standing read, swept by the next
  //     trigger;
  //   - replayed compaction: commitIfAbsent at the same horizon no-ops;
  //   - replayed BATCH whose version was folded+dropped: the re-commit
  //     lands <= horizon, so standing reads never double-count it.

  private def baseRoot(root: String) = s"$root/_base"

  /** Reader grace for retiring superseded base folds: a concurrent
    * standing()/probe reader that resolved the PREVIOUS horizon before a
    * fold landed is still scanning the old base's files — dropping that
    * version immediately turns its scan into FileNotFoundException
    * mid-query. Superseded bases therefore only vacuum once older than
    * this window (mirroring [[graft.engine.SnapshotSet.vacuumSet]]'s
    * graceMillis); storage stays O(folds-per-hour), which is what kills
    * the O(folds) advisory without reintroducing the reader race.
    */
  @volatile var baseVacuumGraceMillis: Long = 3600L * 1000L

  /** The fold horizon: every log version <= this is already in the base. */
  def horizon(s: SparkSession, root: String): Option[Long] =
    VersionedTable.latestVersion(s, baseRoot(root))

  /** Read the base fold at an EXPLICIT horizon — the seam a memoizing
    * standing reader uses to fold from a pinned (horizon, live-versions)
    * snapshot instead of a second listing that could race a compaction.
    */
  def baseRead(s: SparkSession, root: String, h: Long): org.apache.spark.sql.DataFrame =
    VersionedTable.read(s, baseRoot(root), Some(h))

  /** Log versions not yet folded (the versions a standing read unions). */
  def liveVersions(s: SparkSession, root: String): Seq[Long] = {
    val h = horizon(s, root)
    VersionedTable.versions(s, root).filter(v => h.forall(v > _))
  }

  /** The standing state of a compacting lane: the lane's own merge over
    * the base (if any fold happened) plus the live log versions. `fold`
    * is the lane's merge — the same one compaction uses, so
    * standing-before == standing-after by the merge's associativity.
    */
  def standing(s: SparkSession, root: String)(
      fold: Seq[DataFrame] => DataFrame): DataFrame = {
    val base = horizon(s, root)
      .map(h => VersionedTable.read(s, baseRoot(root), Some(h))).toSeq
    fold(base ++ liveVersions(s, root).map(v => VersionedTable.read(s, root, Some(v))))
  }

  /** Sweep fold leftovers and, if the live version count crossed
    * `maxLiveVersions`, fold base+live into a new base snapshot at
    * horizon = max(live) and truncate the folded log versions. Returns
    * the new horizon when a fold published. Single-writer per lane (the
    * streaming query's foreachBatch), like every commit here.
    */
  def maybeCompact(s: SparkSession, root: String, maxLiveVersions: Int)(
      fold: Seq[DataFrame] => DataFrame): Option[Long] = {
    val h = horizon(s, root)
    // leftovers of a fold that crashed before its drops: already served
    // by the base, invisible to standing reads — finish the truncation
    VersionedTable.versions(s, root).filter(v => h.exists(v <= _))
      .foreach(v => VersionedTable.dropVersion(s, root, v))
    val live = liveVersions(s, root)
    if (live.size < maxLiveVersions) None
    else {
      val newH = live.max
      val folded = fold(
        h.map(hh => VersionedTable.read(s, baseRoot(root), Some(hh))).toSeq ++
          live.map(v => VersionedTable.read(s, root, Some(v))))
      // the base write fully materializes BEFORE any input version
      // drops. The _base root inherits the LOG root's commit mode
      // explicitly — on an object store, falling back to the mutable
      // process default here would let a rename-mode base sneak under a
      // manifest-mode lane, reintroducing the torn-rename hazard on the
      // compacted path.
      VersionedTable.commitIfAbsent(folded, baseRoot(root), newH,
        Some(VersionedTable.modeOf(s, root)))
      live.foreach(v => VersionedTable.dropVersion(s, root, v))
      // retire superseded base folds, else a week-long lane keeps
      // O(folds) full copies of its cumulative state — quadratic
      // storage. Safe through every crash window: a replayed fold's
      // commitIfAbsent at the same horizon no-ops, and standing() only
      // ever reads the LATEST horizon. Age-gated (baseVacuumGraceMillis)
      // so an in-flight reader of the PREVIOUS horizon finishes its scan.
      VersionedTable.vacuum(s, baseRoot(root), keepLast = 1,
        graceMillis = baseVacuumGraceMillis)
      Some(newH)
    }
  }

  /** [[toVersioned]] with the auto-compaction policy: every batch
    * commits exactly-once as before, and when the live log crosses
    * `maxLiveVersions` the lane folds itself. `fold` must be the lane's
    * merge (union∪distinct for gram sets, plain union for CDC logs…) —
    * associative, so batch boundaries stay invisible.
    */
  def toVersionedCompacting(events: DataFrame, root: String,
      checkpoint: String, maxLiveVersions: Int = 16)(
      derive: (DataFrame, Long) => DataFrame)(
      fold: Seq[DataFrame] => DataFrame): StreamingQuery =
    run(events, checkpoint) { (batch, batchId) =>
      VersionedTable.commitIfAbsent(derive(batch, batchId), root, batchId)
      maybeCompact(batch.sparkSession, root, maxLiveVersions)(fold): Unit
    }
}
