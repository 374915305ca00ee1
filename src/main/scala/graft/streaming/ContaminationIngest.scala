package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Dedup

/** Streaming contamination guard — the x210 audit as a continuously
  * maintained index: arriving TRAIN documents commit their distinct
  * n-gram hashes as one [[VersionedTable]] version per batch (the
  * [[SnapshotIngest]] exactly-once discipline), and an eval set probes
  * the STANDING union at any time. This is the production shape of the
  * benchmark-leak check: the corpus is ingested once, grams are
  * per-batch distinct partials (merge = union ∪ distinct, associative
  * — the merge-equals-rebuild invariant), and a probe never touches
  * the corpus, only the gram index.
  */
object ContaminationIngest {

  val GramN = 4

  /** One train batch's distinct gram hashes. The batch text is spread
    * to defaultParallelism first when it arrives narrower (a source
    * micro-batch is often 1-2 partitions while the gram explode
    * amplifies ~50x in CPU — the one-partition text-scan trap, streaming
    * form); identity when the batch is already wide, so a production
    * feed pays no extra shuffle.
    */
  def gramBatch(docs: DataFrame): DataFrame = {
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions >= p) docs else docs.repartition(p)
    Dedup.corpusGrams(spread, GramN)
  }

  /** Start the index maintenance: (doc_id, text) stream → one gram
    * snapshot per batchId.
    */
  def streamingGramIngest(docs: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    SnapshotIngest.toVersioned(docs, root, checkpoint)(
      (batch, _) => gramBatch(batch))

  /** The lane's merge — union ∪ distinct over gram partials. It is the
    * SAME fold standing reads and compaction use, so fold boundaries
    * are invisible by associativity (merge-equals-rebuild, x211).
    */
  val gramFold: Seq[DataFrame] => DataFrame =
    dfs => dfs.reduce(_ unionByName _).distinct()

  /** [[streamingGramIngest]] with self-compaction: a week-long lane
    * commits thousands of tiny per-batch gram snapshots; once the live
    * log crosses `maxLiveVersions`, the lane folds base+live into one
    * distinct base snapshot (shrinking, since grams repeat across
    * batches) and truncates the folded versions. Standing probes are
    * unchanged — [[standingGrams]] reads base + live either way.
    */
  def streamingGramIngestCompacting(docs: DataFrame, root: String,
      checkpoint: String, maxLiveVersions: Int = 16): StreamingQuery =
    SnapshotIngest.toVersionedCompacting(docs, root, checkpoint,
      maxLiveVersions)((batch, _) => gramBatch(batch))(gramFold)

  /** The standing train gram set: the distinct union of the compacted
    * base (if any fold happened) and every live committed snapshot.
    */
  def standingGrams(s: SparkSession, root: String): DataFrame = {
    val hasBase = SnapshotIngest.horizon(s, root).isDefined
    val live = SnapshotIngest.liveVersions(s, root)
    // Before the first batch commits (or after a vacuum to zero) the
    // standing set is EMPTY, not an error: an empty (h) frame keeps
    // probe() total and avoids reduce's opaque empty.reduceLeft throw.
    if (!hasBase && live.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.LongType, nullable = false))))
    else SnapshotIngest.standing(s, root)(gramFold)
  }

  /** Probe an eval frame against the standing index. */
  def probe(evalDocs: DataFrame, standing: DataFrame,
      threshold: Double = 0.05): DataFrame =
    Dedup.contaminationProbe(Dedup.gramSet(evalDocs, GramN), standing, threshold)

  /** x211: the maintained-index core as a graded batch twin (the
    * x152/x172 discipline) — train documents arrive as TWO batches
    * split at `splitAt`, gram partials merge by union∪distinct, and
    * the src19 eval probe of the merged index must equal the
    * whole-corpus x210 report, which is exactly what the DuckDB twin
    * rebuilds. A dropped batch, a non-distinct merge, or a probe that
    * misses the second batch's grams all hash-fail.
    */
  def contaminationTwin(s: SparkSession, dir: String,
      splitAt: Long = 250L): DataFrame = {
    // batch slices come off the shared cached gram frame (per-batch
    // distinct h of a doc slice == corpusGrams of those docs — the
    // frame is already doc-grain distinct); the STREAMING path
    // (gramBatch) keeps the raw per-batch derivation
    val g = graft.ext.Dedup.allGrams(s, dir, GramN)
    val train = g.filter(col("source") =!= "src19")
    def batch(p: org.apache.spark.sql.Column) =
      train.filter(p).select(col("h")).distinct()
    val merged = batch(col("doc_id") < splitAt)
      .unionByName(batch(col("doc_id") >= splitAt))
      .distinct()
    graft.ext.Dedup.contaminationProbe(
      g.filter(col("source") === "src19").select(col("doc_id"), col("h")),
      merged, 0.05)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x211_contamination_ingest" ->
      ((s: SparkSession, dir: String) => contaminationTwin(s, dir)))

  val oracles: Map[String, String] = Map(
    // merge-equals-rebuild: the oracle IS the whole-corpus x210 twin
    "x211_contamination_ingest" -> Dedup.oracles("x210_contamination"))
}
