package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming contamination index: the streamed gram snapshots serve
  * the same report as the whole-corpus batch audit, and replay commits
  * nothing twice.
  */
class ContaminationIngestSpec extends SparkSpec {

  test("streamed index == whole-corpus x210 report; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_contam").toString
    val docs = graft.engine.Tables(spark, Sf, "documents")
    val train = docs.filter(col("source") =!= "src19")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = ContaminationIngest.streamingGramIngest(
      in.toDF().toDF("doc_id", "text"), s"$dirs/grams", s"$dirs/ckpt")
    try {
      val (b1, b2) = train.splitAt(train.length / 2)
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable()
      val served = ContaminationIngest.probe(
        docs.filter(col("source") === "src19"),
        ContaminationIngest.standingGrams(spark, s"$dirs/grams"))
        .collect().map(_.toString).toSeq
      val batch = graft.ext.Dedup.contaminationReport(spark, Sf)
        .collect().map(_.toString).toSeq
      assert(served === batch, "streamed index must serve the rebuild's report")
      // replay: committing the same batchIds again must change nothing
      val versionsBefore =
        graft.engine.VersionedTable.versions(spark, s"$dirs/grams")
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      assert(graft.engine.VersionedTable.versions(spark, s"$dirs/grams")
        .size === versionsBefore.size + 1) // a NEW batch commits anew...
      // ...but re-running the probe still matches (grams are a set)
      val served2 = ContaminationIngest.probe(
        docs.filter(col("source") === "src19"),
        ContaminationIngest.standingGrams(spark, s"$dirs/grams"))
        .collect().map(_.toString).toSeq
      assert(served2 === batch)
    } finally q.stop()
  }
}
