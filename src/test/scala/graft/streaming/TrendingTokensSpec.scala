package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintained-counts contract: batch-by-batch merge equals one
  * rebuild, the streaming runner accumulates across batches, and replay
  * is a skipped commit (exactly-once).
  */
class TrendingTokensSpec extends SparkSpec {

  test("merge of standing + batch counts equals a one-pass rebuild") {
    val docs = graft.engine.Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text"))
    val whole = TrendingTokens.tokenCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val merged = TrendingTokens.mergeCounts(
        TrendingTokens.tokenCounts(docs.filter(col("doc_id") < 300)),
        TrendingTokens.tokenCounts(docs.filter(col("doc_id") >= 300)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged === whole)
    // and a three-way split merges to the same state (associativity)
    val threeWay = Seq(
      docs.filter(col("doc_id") < 100),
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 300),
      docs.filter(col("doc_id") >= 300))
      .map(TrendingTokens.tokenCounts)
      .reduce(TrendingTokens.mergeCounts)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(threeWay === whole)
  }

  test("streaming counts accumulate across batches and replay exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_trend").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TrendingTokens.streamingTrendingTokens(spark,
      in.toDF().toDF("doc_id", "text"), Sf, s"$dirs/counts", s"$dirs/ckpt")
    try {
      val base = TrendingTokens.tokenCounts(
          graft.engine.Tables(spark, Sf, "documents").select(col("doc_id"), col("text")))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      in.addData((9000L, "zebra zebra quagga"))
      q.processAllAvailable()
      in.addData((9001L, "zebra okapi"))
      q.processAllAvailable()
      val root = s"$dirs/counts"
      assert(graft.engine.VersionedTable.versions(spark, root) == Seq(0L, 1L))
      def counts(v: Long) = graft.engine.VersionedTable.read(spark, root, Some(v))
        .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("n"))).toMap
      val v0 = counts(0L)
      assert(v0.getOrElse("zebra", 0L) === base.getOrElse("zebra", 0L) + 2L)
      assert(v0.getOrElse("quagga", 0L) === base.getOrElse("quagga", 0L) + 1L)
      val v1 = counts(1L)
      assert(v1.getOrElse("zebra", 0L) === base.getOrElse("zebra", 0L) + 3L)
      assert(v1.getOrElse("okapi", 0L) === base.getOrElse("okapi", 0L) + 1L)
      // untouched tokens carry through unchanged
      val someTok = base.keys.head
      assert(v1.get(someTok).contains(base(someTok)))
      // replay of batch 0 is a skipped commit: the snapshot is immutable
      graft.engine.VersionedTable.commitIfAbsent(
        Seq(("bogus", 99L)).toDF("token", "n"), root, 0L)
      assert(counts(0L) === v0, "replay must not alter the snapshot")
    } finally q.stop()
  }
}
