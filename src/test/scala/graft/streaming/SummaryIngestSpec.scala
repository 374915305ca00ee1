package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.QDigest

/** Streaming summary maintenance: snapshot-served summaries equal
  * from-scratch builds (bitwise for the digest's count maps, exactly
  * for the KMV row sets), and replays are no-ops.
  */
class SummaryIngestSpec extends SparkSpec {

  test("digest partials committed per batch serve the same digest as a batch build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_sumdig").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = SummaryIngest.streamingDigestIngest(spark,
      in.toDF().toDF("day", "qv"), s"$dirs/d", s"$dirs/ck")
    try {
      val b1 = (1 to 4000).map(i => ("2026-01-01", (i * 48271L) % 65536))
      val b2 = (1 to 3000).map(i => ("2026-01-02", (i * 2654435761L) % 65536))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val served = SummaryIngest.servedDigest(spark, s"$dirs/d")
      assert(served.n === 7000L)
      // batch twin over the same batch splits: count addition makes the
      // union grouping-invariant, so the count maps agree BITWISE
      val twin = {
        val p1 = SummaryIngest.digestBatch(b1.toDF("day", "qv"))
        val p2 = SummaryIngest.digestBatch(b2.toDF("day", "qv"))
        val merge = udaf(new graft.functions.QDigestMergeAgg(),
          org.apache.spark.sql.Encoders.BINARY)
        QDigest.fromBytes(p1.unionByName(p2).agg(merge(col("sk")))
          .head().getAs[Array[Byte]](0))
      }
      assert(served === twin, "snapshot-served digest must equal the batch merge")
      // and the served quantiles respect the error bound vs exact
      val all = (b1 ++ b2).map(_._2).sorted.toIndexedSeq
      Seq(0.5, 0.9, 0.99).foreach { p =>
        val est = served.quantile(p)
        val target = math.ceil(p * all.length).toLong.max(1L)
        val lo = all.indexWhere(_ >= est) match { case -1 => all.length case i => i + 1 }
        val hi = all.lastIndexWhere(_ <= est) match { case -1 => 0 case i => i + 1 }
        val err = if (target < lo) (lo - target).toDouble / all.length
        else if (target > hi) (target - hi).toDouble / all.length else 0.0
        assert(err <= 2 * 17.0 / 2000.0, s"q=$p err=$err")
      }
      // replay: batch 0 re-commit is skipped
      graft.engine.VersionedTable.commitIfAbsent(
        spark.range(1).selectExpr("'x' AS day", "CAST(NULL AS BINARY) AS sk",
          "0L AS n_day"), s"$dirs/d", 0L)
      assert(SummaryIngest.servedDigest(spark, s"$dirs/d") === served)
    } finally q.stop()
  }

  test("KMV partials committed per batch serve the exact from-scratch bottom-k") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_sumkmv").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = SummaryIngest.streamingKmvIngest(spark,
      in.toDF().toDF("source", "h"), s"$dirs/k", s"$dirs/ck", k = 16)
    try {
      val b1 = (1 to 500).map(i => ("a", (i * 7919L) % 100000)) ++
        (1 to 400).map(i => ("b", (i * 104729L) % 100000))
      val b2 = (1 to 300).map(i => ("a", (i * 15485863L) % 100000))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val served = SummaryIngest.servedKmv(spark, s"$dirs/k", k = 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val full = SummaryIngest.kmvBatch((b1 ++ b2).toDF("source", "h"), k = 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(served === full,
        "bottom-k of unioned partials must equal the full-stream bottom-k")
      assert(served.count(_._1 == "a") === 16)
    } finally q.stop()
  }
}
