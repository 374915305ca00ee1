package graft.streaming

import graft.SparkSpec
import graft.ext.Retrieval

/** The streaming index contract: an index served from per-batch tf
  * snapshots ranks bit-identically to the monolithic build, and replayed
  * batches never double-count.
  */
class RetrievalIngestSpec extends SparkSpec {

  test("snapshot-served BM25 equals the monolithic ranking; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_ridx").toString
    val corpus = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = RetrievalIngest.streamingIndexIngest(
      in.toDF().toDF("doc_id", "text"), s"$dirs/tf", s"$dirs/ckpt")
    try {
      // the corpus arrives as three micro-batches
      corpus.grouped((corpus.length + 2) / 3).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      val vs = graft.engine.VersionedTable.versions(spark, s"$dirs/tf")
      assert(vs.size === 3, "one snapshot per micro-batch")
      val served = Retrieval.bm25TopkFromIndex(
        RetrievalIngest.indexFromSnapshots(spark, s"$dirs/tf"),
        Retrieval.queryTerms(spark, Sf, 3), 10).collect()
      val mono = Retrieval.bm25Topk(spark, Sf, numQueries = 3, k = 10).collect()
      assert(served.length === mono.length)
      served.zip(mono).foreach { case (a, b) =>
        assert(a === b, "snapshot-served ranking must equal monolithic bitwise")
      }
      // a replayed batch is a skipped commit: totals unchanged
      val before = RetrievalIngest.indexFromSnapshots(spark, s"$dirs/tf")
        .stats.collect()(0)
      graft.engine.VersionedTable.commitIfAbsent(
        spark.range(1).selectExpr("999 AS doc_id", "'bogus' AS term", "9 AS tf"),
        s"$dirs/tf", 0L)
      val after = RetrievalIngest.indexFromSnapshots(spark, s"$dirs/tf")
        .stats.collect()(0)
      assert(before === after, "replay must not alter the served index")
    } finally q.stop()
  }
}
