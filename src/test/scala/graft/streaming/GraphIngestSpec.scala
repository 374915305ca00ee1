package graft.streaming

import graft.SparkSpec
import graft.ext.NnGraph

/** The streaming graph contract: insertion edges accumulated across
  * micro-batches equal the x194 batch twin bitwise (insertion is
  * read-only on the standing graph, so batch splits cannot change the
  * result), and replayed batches never double-commit.
  */
class GraphIngestSpec extends SparkSpec {

  test("snapshot-accumulated insertions equal the batch twin; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_gidx").toString
    val arrivals = spark.read.parquet(s"$Sf/embeddings.parquet")
      .where("vec_id % 10 = 9")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(arrivals.nonEmpty)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = GraphIngest.streamingGraphInsert(
      in.toDF().toDF("vec_id", "embedding"), Sf, s"$dirs/edges", s"$dirs/ckpt")
    try {
      arrivals.grouped((arrivals.length + 1) / 2).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      assert(graft.engine.VersionedTable.versions(spark, s"$dirs/edges").size === 2)
      val streamed = GraphIngest.edgesFromSnapshots(spark, s"$dirs/edges")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val twin = NnGraph.graphInsert(spark, Sf).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === twin,
        "streaming insertion edges must equal the x194 batch twin")
      // replay: re-committing an already-committed batchId is skipped
      graft.engine.VersionedTable.commitIfAbsent(
        spark.range(1).selectExpr("CAST(999 AS BIGINT) AS src",
          "CAST(999 AS BIGINT) AS nbr", "CAST(0 AS BIGINT) AS dist"),
        s"$dirs/edges", 0L)
      val after = GraphIngest.edgesFromSnapshots(spark, s"$dirs/edges")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(after === twin, "replay must not alter the accumulated edges")
    } finally q.stop()
  }
}
