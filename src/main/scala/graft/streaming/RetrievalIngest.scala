package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.VersionedTable
import graft.ext.Retrieval

/** Streaming maintenance of the BM25 index — the retrieval lane's
  * streaming form, mirroring CorpusIngest: each micro-batch of
  * (doc_id, text) rows reduces to its doc-grain term-frequency partial
  * ([[Retrieval.tfPartial]] — the ONE persisted artifact) and commits as
  * a [[VersionedTable]] snapshot keyed by batchId; `commitIfAbsent`
  * makes at-least-once replay exactly-once (a replayed batch is a
  * skipped commit). The serving index derives from the UNION of
  * snapshots ([[Retrieval.indexFromTf]]) — x128's merge-equals-rebuild
  * gate is precisely why serving from partials is sound.
  *
  * Scale shape: per batch, only that batch's documents are tokenized
  * (map-side; one narrow (doc_id, term, tf) aggregate); history is never
  * re-read at ingest time. Query-time derivation re-aggregates df/stats
  * from the tf union — at cluster scale those roll up incrementally too
  * (df partials are count-mergeable, the x126 pattern), which
  * RetrievalIngestSpec pins via the x128 equality.
  */
object RetrievalIngest {

  /** Start the ingest: docs stream → tf partial per micro-batch →
    * one committed snapshot per batchId.
    */
  def streamingIndexIngest(docs: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    SnapshotIngest.toVersioned(docs, root, checkpoint)(
      (batch, _) => Retrieval.tfPartial(batch))

  /** The serving index at a point in time: derived from every committed
    * tf snapshot.
    */
  def indexFromSnapshots(s: SparkSession, root: String): Retrieval.Bm25Index = {
    val parts = VersionedTable.versions(s, root)
      .map(v => VersionedTable.read(s, root, Some(v)))
    Retrieval.indexFromTf(parts.reduce(_ unionByName _))
  }

  // streaming-only lane: correctness is pinned by RetrievalIngestSpec
  // (snapshot-served ranking == monolithic x123 ranking, bitwise; replay
  // idempotency), and the scoring core itself is hash-gated via
  // x123/x128.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  val oracles: Map[String, String] = Map.empty
}
