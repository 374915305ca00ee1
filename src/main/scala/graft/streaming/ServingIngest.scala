package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.{Tables, VersionedTable}
import graft.ext.Clustering
import graft.engine.Pin.PinOps

/** The IVF-PQ serving lane's streaming form — the refresh boundary
  * between a training pipeline and a serving tier, run continuously:
  * arriving embedding vectors are ENCODED against the pinned published
  * index (nearest frozen centroid + frozen residual codebook — the x157
  * snapshot, never an in-memory frame), each batch's codes and grid
  * vectors commit as one [[VersionedTable]] snapshot per batchId
  * (`commitIfAbsent` makes at-least-once replay exactly-once — the
  * CorpusIngest discipline), and the served index is base codes plus
  * every committed arrival snapshot.
  *
  * The maintained invariant is the lane's merge-equals-rebuild form:
  * because encoding against a FROZEN index is a pure per-vector
  * function, batch-by-batch snapshots union to exactly the one-shot
  * encode of all arrivals — ServingIngestSpec gates it bitwise through
  * the full ADC ranking.
  *
  * Refresh: the x150-style drift gate (exact-integer cross-multiplied
  * mean assignment inertia, arrivals vs base) decides when ONE warm
  * Lloyd round (the x158 core) folds the arrivals in: refreshed
  * centroids and fully re-encoded codes (book stays frozen — residual
  * codebooks outlive centroid nudges) republish at version = the fold
  * watermark (last folded batchId + 1), and serving reads latest codes
  * plus only arrival snapshots AT OR ABOVE the watermark — folded
  * batches are superseded, never double-counted.
  *
  * Scale shape: per batch only that batch's vectors are assigned and
  * encoded (centroids/book broadcast); the standing corpus is touched
  * only at a refresh, which is two passes (assign + recompute), not a
  * retrain.
  */
object ServingIngest {

  private def centsRoot(root: String) = s"$root/cents"
  private def bookRoot(root: String) = s"$root/book"
  private def codesRoot(root: String) = s"$root/codes"
  private def arrivalCodes(root: String) = s"$root/arrival_codes"
  private def arrivalVecs(root: String) = s"$root/arrival_vecs"
  private def baseVecs(root: String) = s"$root/base_vecs"

  /** Train the frozen index on the standing corpus (vec_id < splitAt of
    * `dir`'s embeddings) and publish it: cents/book/codes at version 0
    * (watermark 0 = "no arrivals folded"), plus the base grid vectors
    * (the refresh needs real vectors — 4-bit codes cannot recompute a
    * centroid; a production tier keeps the vector store next to the
    * index exactly like this).
    */
  def publishBaseIndex(s: SparkSession, dir: String, root: String,
      splitAt: Long, kCoarse: Int = 8, numQueries: Int = 3): Unit = {
    val base = Clustering.gridVecs(Tables(s, dir, "embeddings"))
      .filter(col("vec_id") < splitAt)
    val (c, b, k) = Clustering.ivfpqModelFor(base, kCoarse, numQueries)
    VersionedTable.commitIfAbsent(c, centsRoot(root), 0L)
    VersionedTable.commitIfAbsent(b, bookRoot(root), 0L)
    VersionedTable.commitIfAbsent(k, codesRoot(root), 0L)
    VersionedTable.commitIfAbsent(base, baseVecs(root), 0L): Unit
  }

  /** The latest published (cents, book, codes, watermark). */
  def loadIndex(s: SparkSession, root: String): (DataFrame, DataFrame, DataFrame, Long) = {
    val w = VersionedTable.latestVersion(s, codesRoot(root)).getOrElse(0L)
    (VersionedTable.read(s, centsRoot(root)),
      VersionedTable.read(s, bookRoot(root)),
      VersionedTable.read(s, codesRoot(root)), w)
  }

  /** The streaming runner: per micro-batch of (vec_id, embedding) rows,
    * quantize to the index's grid, encode against the PUBLISHED frozen
    * index, and commit the batch's codes and vectors as version
    * batchId. Exactly-once under replay via commitIfAbsent.
    */
  def streamingIvfpqEncode(s: SparkSession, arrivals: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    SnapshotIngest.run(arrivals, checkpoint) { (batch, batchId) =>
      val (c, b, _, _) = loadIndex(s, root)
      val vecs = Clustering.gridVecs(batch)
      VersionedTable.commitIfAbsent(
        Clustering.ivfpqEncodeWith(vecs, c, b), arrivalCodes(root), batchId)
      VersionedTable.commitIfAbsent(vecs, arrivalVecs(root), batchId): Unit
    }

  /** The served code set: the latest codes snapshot (fold watermark w)
    * plus arrival snapshots with batchId >= w — folded batches are
    * inside the codes snapshot already.
    */
  def servedCodes(s: SparkSession, root: String): DataFrame = {
    val (_, _, codes, w) = loadIndex(s, root)
    VersionedTable.versions(s, arrivalCodes(root)).filter(_ >= w)
      .map(v => VersionedTable.read(s, arrivalCodes(root), Some(v)))
      .foldLeft(codes)(_ unionByName _)
  }

  /** Snapshot-served ADC ranking — the batch x145 pass over the frozen
    * published index and every committed arrival.
    */
  def snapshotTopk(s: SparkSession, dir: String, root: String, nprobe: Int = 2,
      numQueries: Int = 3, k: Int = 10): DataFrame = {
    val (c, b, _, _) = loadIndex(s, root)
    Clustering.ivfpqTopkWith(s, dir, c, b, servedCodes(s, root), nprobe,
      numQueries, k)
  }

  /** The drift-gated refresh: if the committed arrivals' mean frozen-
    * assignment inertia exceeds factorNum/factorDen times the base's
    * (exact-integer gate — x150's ratio as a decision), ONE warm Lloyd
    * round over base + arrivals republishes centroids and fully
    * re-encoded codes at version lastBatch+1 (the fold watermark), and
    * the folded vectors become the new base snapshot. Returns whether
    * it fired. Call between batches (the stream itself never retrains).
    */
  def refreshIfDrifted(s: SparkSession, root: String, numQueries: Int = 3,
      factorNum: Long = 2L, factorDen: Long = 1L): Boolean = {
    val (c, b, _, w) = loadIndex(s, root)
    val newBatches = VersionedTable.versions(s, arrivalVecs(root)).filter(_ >= w)
    if (newBatches.isEmpty) return false
    val base = VersionedTable.read(s, baseVecs(root))
    val arr = newBatches
      .map(v => VersionedTable.read(s, arrivalVecs(root), Some(v)))
      .reduce(_ unionByName _)
    if (!Clustering.assignmentDrifted(base, arr, c, factorNum, factorDen)) return false
    val all = base.unionByName(arr).pinned
    val cNew = Clustering.warmCentroids(all, c).pinned
    val codesNew = Clustering.ivfpqEncodeWith(
      all.filter(col("vec_id") >= numQueries), cNew, b)
    val wNew = newBatches.max + 1L
    VersionedTable.commitIfAbsent(cNew, centsRoot(root), wNew)
    VersionedTable.commitIfAbsent(codesNew, codesRoot(root), wNew)
    VersionedTable.commitIfAbsent(all, baseVecs(root), wNew)
    true
  }
}
