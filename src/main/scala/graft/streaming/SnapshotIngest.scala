package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
}
