package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming ingest contract: admits exactly what the batch gates
  * admit, dedups against the corpus AND earlier batches, and replay is
  * a no-op.
  */
class CorpusIngestSpec extends SparkSpec {

  private val Dir = Sf

  // >= 100 chars, >= 20 tokens, punctuation-free: passes the quality gate
  private def goodText(tag: String): String =
    (1 to 24).map(i => s"$tag word$i").mkString(" ")

  test("acceptBatch admits quality + novel docs, drops dups and junk") {
    import spark.implicits._
    // a corpus doc that PASSES the quality gate, so its batch twin is
    // dropped by the anti-join specifically, not by the gate
    val corpusText = graft.engine.Tables(spark, Dir, "documents")
      .filter(graft.ext.TextAnalysis.qualityOkCol(col("text")))
      .orderBy(col("doc_id")).select("text").head().getString(0)
    val batch = Seq(
      (1000L, goodText("alpha")),          // fresh, quality -> admitted
      (1001L, corpusText),                 // duplicate of the corpus -> dropped
      (1002L, "too short!!!"),             // fails the quality gate -> dropped
      (1003L, goodText("alpha")),          // intra-batch dup of 1000 -> dropped
      (1004L, goodText("beta"))            // fresh -> admitted
    ).toDF("doc_id", "text")
    val standing = graft.engine.Tables(spark, Dir, "documents")
      .select(graft.ext.TextAnalysis.fingerprintCol(col("text")).as("fp"))
    val got = CorpusIngest.acceptBatch(batch, standing)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == Set(1000L, 1004L))
  }

  test("intra-batch canonical is the smallest doc_id") {
    import spark.implicits._
    val batch = Seq(
      (7L, goodText("gamma")), (5L, goodText("gamma")), (6L, goodText("delta"))
    ).toDF("doc_id", "text")
    val none = Seq.empty[String].toDF("fp")
    val got = CorpusIngest.acceptBatch(batch, none)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == Set(5L, 6L), "first occurrence by doc_id wins")
  }

  test("streaming ingest dedups across batches and replays exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CorpusIngest.streamingCorpusIngest(spark,
      in.toDF().toDF("doc_id", "text"), Dir, s"$dirs/docs", s"$dirs/ckpt")
    try {
      in.addData((2000L, goodText("epsilon")), (2001L, goodText("zeta")))
      q.processAllAvailable()
      // batch 1 repeats a batch-0 doc two batches of state away from the
      // corpus: the committed snapshot itself must supply the fingerprint
      in.addData((2002L, goodText("epsilon")), (2003L, goodText("eta")))
      q.processAllAvailable()
      val vs = graft.engine.VersionedTable.versions(spark, s"$dirs/docs")
      assert(vs == Seq(0L, 1L))
      def ids(v: Long) = graft.engine.VersionedTable.read(spark, s"$dirs/docs", Some(v))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids(0L) == Set(2000L, 2001L))
      assert(ids(1L) == Set(2003L), "cross-batch duplicate must be dropped")
      // replay of batch 0 is a skipped commit
      graft.engine.VersionedTable.commitIfAbsent(
        spark.range(1).selectExpr("99 AS doc_id", "99 AS n_tokens", "'z' AS fp"),
        s"$dirs/docs", 0L)
      assert(ids(0L) == Set(2000L, 2001L), "replay must not alter the snapshot")
    } finally q.stop()
  }
}
