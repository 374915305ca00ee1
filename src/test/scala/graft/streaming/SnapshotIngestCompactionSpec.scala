package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.engine.{CommitMode, VersionedTable}

/** The self-compacting ingest lane's invariants, spec-driven (the
  * crash-window reasoning in SnapshotIngest's comments, pinned):
  *
  *   - crossing `maxLiveVersions` folds base+live into a base snapshot
  *     at horizon = max(live) and truncates the folded log versions;
  *   - the standing row-set is IDENTICAL before and after a fold;
  *   - a crash between the base commit and the log drops is invisible
  *     (leftovers <= horizon are excluded from standing reads and swept
  *     by the next trigger);
  *   - a replayed batch whose version was folded+dropped re-commits
  *     below the horizon and stays invisible — never double-counted;
  *   - superseded base folds are vacuumed (exactly one base version
  *     survives, so a week-long lane's footprint is O(state), not
  *     O(folds × state));
  *   - the `_base` root inherits the LOG root's commit mode, not the
  *     mutable process-wide default at fold time.
  */
class SnapshotIngestCompactionSpec extends SparkSpec {

  import spark.implicits._

  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    // restore (not hard-reset) so the ManifestModeFixture variant keeps
    // its suite-wide default across tests
    val before = VersionedTable.defaultMode
    val beforeGrace = SnapshotIngest.baseVacuumGraceMillis
    try super.withFixture(test)
    finally {
      VersionedTable.defaultMode = before
      SnapshotIngest.baseVacuumGraceMillis = beforeGrace
    }
  }

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_compact").toString + "/log"

  /** Per-batch frames with overlapping keys, so union∪distinct shrinks. */
  private def batchDf(b: Int): DataFrame =
    ((b * 10) until (b * 10 + 15)).map(_.toLong).toDF("h")

  private val distinctFold: Seq[DataFrame] => DataFrame =
    dfs => dfs.reduce(_ unionByName _).distinct()

  private def standingSet(root: String): Set[Long] =
    SnapshotIngest.standing(spark, root)(distinctFold)
      .collect().map(_.getLong(0)).toSet

  test("fold at maxLiveVersions: horizon = max(live), log truncated, standing identical") {
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    val before = standingSet(root)
    assert(SnapshotIngest.maybeCompact(spark, root, 5)(distinctFold).isEmpty,
      "below the threshold no fold may publish")
    val h = SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold)
    assert(h === Some(3L), "the fold horizon must be max(live)")
    assert(SnapshotIngest.horizon(spark, root) === Some(3L))
    assert(VersionedTable.versions(spark, root).isEmpty,
      "every folded log version must be truncated")
    assert(standingSet(root) === before,
      "the standing row-set must be identical across a fold")
  }

  test("standing keeps merging base + live after a fold") {
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold)
    VersionedTable.commitIfAbsent(batchDf(4), root, 4L)
    assert(SnapshotIngest.liveVersions(spark, root) === Seq(4L))
    assert(standingSet(root) ===
      (0 until 5).flatMap(b => (b * 10) until (b * 10 + 15)).map(_.toLong).toSet)
  }

  test("crash between base commit and log drops: invisible, swept by next trigger") {
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    val before = standingSet(root)
    // simulate the crashed fold: the base materializes at horizon 3 but
    // the writer dies before ANY log drop
    VersionedTable.commitIfAbsent(
      distinctFold((0 until 4).map(v =>
        VersionedTable.read(spark, root, Some(v.toLong)))),
      s"$root/_base", 3L)
    assert(VersionedTable.versions(spark, root).size === 4,
      "the crash left every folded log version on disk")
    assert(standingSet(root) === before,
      "leftovers <= horizon must be excluded from standing reads")
    // next trigger (any threshold): sweeps the leftovers, no new fold
    assert(SnapshotIngest.maybeCompact(spark, root, 100)(distinctFold).isEmpty)
    assert(VersionedTable.versions(spark, root).isEmpty,
      "the sweep must finish the crashed fold's truncation")
    assert(standingSet(root) === before)
  }

  test("replayed batch below the horizon stays invisible and is swept") {
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    val before = standingSet(root)
    SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold)
    // the at-least-once replay: batch 1's version was folded+dropped, so
    // commitIfAbsent RE-COMMITS it — below the horizon
    assert(VersionedTable.commitIfAbsent(batchDf(1), root, 1L))
    assert(SnapshotIngest.liveVersions(spark, root).isEmpty,
      "a re-committed version <= horizon is not live")
    assert(standingSet(root) === before,
      "the replay must never double-count folded rows")
    SnapshotIngest.maybeCompact(spark, root, 100)(distinctFold)
    assert(VersionedTable.versions(spark, root).isEmpty,
      "the next trigger sweeps the replayed leftover")
  }

  test("superseded base folds are vacuumed: exactly one base version") {
    SnapshotIngest.baseVacuumGraceMillis = 0L // all folds "stale" at once
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    assert(SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold) === Some(3L))
    (4 until 8).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    assert(SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold) === Some(7L))
    assert(VersionedTable.versions(spark, s"$root/_base") === Seq(7L),
      "each fold must retire the base it superseded")
    assert(standingSet(root) ===
      (0 until 8).flatMap(b => (b * 10) until (b * 10 + 15)).map(_.toLong).toSet)
  }

  test("a freshly superseded base survives the reader grace window") {
    // the ADVICE race: a standing() reader resolved horizon 3, then a
    // fold to horizon 7 lands — with the default 1h grace the old base
    // version must remain readable until the window passes
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    assert(SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold) === Some(3L))
    val oldHorizonRead = VersionedTable.read(spark, s"$root/_base", Some(3L))
    (4 until 8).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    assert(SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold) === Some(7L))
    assert(VersionedTable.versions(spark, s"$root/_base") === Seq(3L, 7L),
      "a base fold younger than the grace window must not be dropped")
    assert(oldHorizonRead.count() ===
      (0 until 4).flatMap(b => (b * 10) until (b * 10 + 15)).distinct.size.toLong,
      "the in-flight reader of the previous horizon must finish its scan")
    assert(SnapshotIngest.horizon(spark, root) === Some(7L),
      "standing reads resolve the LATEST horizon regardless")
  }

  test("_base inherits the log root's commit mode, not the process default") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = tmpRoot()
    (0 until 4).foreach(b =>
      VersionedTable.commitIfAbsent(batchDf(b), root, b.toLong))
    assert(VersionedTable.modeOf(spark, root) === CommitMode.ManifestLog)
    // the drift ADVICE flagged: the default flips back before the fold
    VersionedTable.defaultMode = CommitMode.Rename
    SnapshotIngest.maybeCompact(spark, root, 4)(distinctFold)
    assert(VersionedTable.modeOf(spark, s"$root/_base") === CommitMode.ManifestLog,
      "a manifest-mode lane must never get a rename-mode base")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$root/_base/_manifests")))
  }

  test("end-to-end: the compacting contamination lane serves the batch report") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_ccl").toString
    val docs = graft.engine.Tables(spark, Sf, "documents")
    val train = docs.filter(col("source") =!= "src19")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // maxLiveVersions=2 → the third batch triggers a fold mid-stream
    val q = ContaminationIngest.streamingGramIngestCompacting(
      in.toDF().toDF("doc_id", "text"), s"$dirs/grams", s"$dirs/ckpt", 2)
    try {
      val thirds = train.grouped(math.max(1, train.length / 3 + 1)).toSeq
      thirds.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
      assert(SnapshotIngest.horizon(spark, s"$dirs/grams").isDefined,
        "three batches over maxLiveVersions=2 must have folded")
      val served = ContaminationIngest.probe(
        docs.filter(col("source") === "src19"),
        ContaminationIngest.standingGrams(spark, s"$dirs/grams"))
        .collect().map(_.toString).toSeq
      val batch = graft.ext.Dedup.contaminationReport(spark, Sf)
        .collect().map(_.toString).toSeq
      assert(served === batch,
        "the compacting lane must serve the whole-corpus rebuild's report")
    } finally q.stop()
  }
}
