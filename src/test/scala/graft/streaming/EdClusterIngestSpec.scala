package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental ED-cluster lane: streamed member batches fold into
  * standing state whose served clusters equal the one-shot x217
  * rebuild; replayed batches never double-insert; a mid-stream fold
  * (self-compaction) is invisible to the served result.
  */
class EdClusterIngestSpec extends SparkSpec {

  test("streamed folds serve the one-shot rebuild; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_edc").toString
    val cust = graft.engine.Tables(spark, Sf, "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("nm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // maxLiveVersions=2 → the third batch triggers a fold mid-stream
    val q = EdClusterIngest.streamingEdClusterIngest(
      in.toDF().toDF("key", "nm"), s"$dirs/ed", s"$dirs/ckpt",
      maxLiveVersions = 2)
    try {
      val thirds = cust.grouped(math.max(1, cust.length / 3 + 1)).toSeq
      thirds.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
      assert(SnapshotIngest.horizon(spark, s"$dirs/ed").isDefined,
        "three batches over maxLiveVersions=2 must have folded")
      val served = EdClusterIngest.servedClusters(spark, s"$dirs/ed")
        .collect().map(_.toString).toSeq
      val oneShot = graft.ext.Linkage.edClusters(spark, Sf)
        .collect().map(_.toString).toSeq
      assert(served === oneShot,
        "the folded lane must serve the whole-corpus rebuild's clusters")
      // the at-least-once replay: re-commit batch 0's version
      import spark.implicits._
      graft.engine.VersionedTable.commitIfAbsent(
        thirds.head.toSeq.toDF("key", "nm"), s"$dirs/ed", 0L)
      assert(EdClusterIngest.servedClusters(spark, s"$dirs/ed")
        .collect().map(_.toString).toSeq === oneShot,
        "a replayed batch below the horizon must not alter the clusters")
    } finally q.stop()
  }

  test("repeated standing reads reuse ONE fold; a new batch invalidates it") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_edm").toString + "/ed"
    graft.engine.VersionedTable.commitIfAbsent(
      Seq((1L, "Customer#000000001"), (2L, "Customer#000000002"))
        .toDF("key", "nm"), root, 0L)
    // a read-mostly deployment: three standing reads of an unchanged
    // lane must fold once (at maxLive=4 a re-fold is up to 3 serial
    // edInsertBatch passes per read)
    val st1 = EdClusterIngest.standingState(spark, root, 1, 256)
    val st2 = EdClusterIngest.standingState(spark, root, 1, 256)
    assert(st1 eq st2, "an unchanged lane must reuse the memoized fold")
    val served1 = EdClusterIngest.servedClusters(spark, root)
      .collect().map(_.toString).toSeq
    // a new batch changes the lane's visible (horizon, live) state:
    // the next read folds fresh and serves the updated clusters
    graft.engine.VersionedTable.commitIfAbsent(
      Seq((3L, "Customer#000000003")).toDF("key", "nm"), root, 1L)
    val st3 = EdClusterIngest.standingState(spark, root, 1, 256)
    assert(!(st3 eq st1), "a committed batch must invalidate the fold")
    val served2 = EdClusterIngest.servedClusters(spark, root)
      .collect().map(_.toString).toSeq
    assert(served1 !== served2,
      "the fixture names are pairwise distance 1 — a third member grows the cluster")
    assert(EdClusterIngest.standingState(spark, root, 1, 256) eq st3)
  }

  test("batch twin: the x218 incremental fold equals the x217 one-shot") {
    val inc = graft.ext.Linkage.edClustersIncremental(spark, Sf)
      .collect().map(_.toString).toSeq
    val one = graft.ext.Linkage.edClusters(spark, Sf)
      .collect().map(_.toString).toSeq
    assert(inc === one)
    assert(inc.nonEmpty, "the fixture corpus must produce clusters")
  }
}
