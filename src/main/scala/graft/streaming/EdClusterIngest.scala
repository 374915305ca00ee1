package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Linkage

/** Streaming form of x218's incremental ED-cluster maintenance: new
  * customer batches commit exactly-once through the shared snapshot
  * runner, and the lane self-compacts by folding raw member batches
  * into the standing ED state ([[Linkage.edInsertBatch]] — blocking +
  * verify against new names only, name-pair edges accumulated). The
  * served clusters equal the one-shot whole-corpus rebuild
  * (EdClusterIngestSpec pins it, with replay), the same truth the
  * x218 oracle hash-gates in batch form.
  *
  * At scale: per fold the gram/df pass is linear in DISTINCT names and
  * the verify is proportional to the new names' candidates; the state
  * frame is O(members + name pairs), never corpus².
  */
object EdClusterIngest {

  /** The lane's merge: state frames carry a `kind` column; raw batches
    * are (key, nm). Live versions fold left in version order — final
    * pair set is order-independent (every true pair is verified when
    * the later of its names arrives, whatever the batching).
    */
  def edFold(tau: Int, cap: Int)(frames: Seq[DataFrame]): DataFrame = {
    val (states, batches) = frames.partition(_.columns.contains("kind"))
    require(states.size <= 1,
      s"EdClusterIngest.edFold: expected at most one state frame, got ${states.size}")
    val st0 = states.headOption.getOrElse(
      Linkage.edStateInit(frames.head.sparkSession))
    batches.foldLeft(st0)((st, b) => Linkage.edInsertBatch(st, b, tau, cap))
  }

  /** Start the ingest: events (key, nm) → exactly-once member batches,
    * self-compacting into ED state past `maxLiveVersions`.
    */
  def streamingEdClusterIngest(events: DataFrame, root: String,
      checkpoint: String, maxLiveVersions: Int = 4, tau: Int = 1,
      cap: Int = 256): StreamingQuery =
    SnapshotIngest.toVersionedCompacting(events, root, checkpoint,
      maxLiveVersions)((batch, _) => batch)(edFold(tau, cap))

  /** The standing clusters: fold base state + live batches, resolve. */
  def servedClusters(s: SparkSession, root: String, tau: Int = 1,
      cap: Int = 256): DataFrame =
    Linkage.edClustersFromState(
      SnapshotIngest.standing(s, root)(edFold(tau, cap)))
}
