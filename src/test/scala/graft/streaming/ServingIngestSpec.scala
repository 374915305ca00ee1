package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Clustering

/** The streaming IVF-PQ serving contract: arrival batches encoded
  * against the PINNED published index union to exactly the one-shot
  * encode (frozen-index encoding is a pure per-vector function), the
  * full snapshot-served ADC ranking equals the batch plan bitwise,
  * replayed batches never double-encode, and the drift gate fires only
  * on genuinely drifted arrivals — republishing a folded index that
  * supersedes (not double-counts) the folded snapshots.
  */
class ServingIngestSpec extends SparkSpec {

  private val SplitAt = 400L
  private val NumQ = 3

  private def baseGrid = Clustering.gridVecs(
    spark.read.parquet(s"$Sf/embeddings.parquet"))
    .filter(col("vec_id") < SplitAt)

  private def arrivalRows: Array[(Long, Array[Float])] =
    spark.read.parquet(s"$Sf/embeddings.parquet")
      .filter(col("vec_id") >= SplitAt)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  test("snapshot-served ADC ranking equals the batch plan across two batches; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    ServingIngest.publishBaseIndex(spark, Sf, root, SplitAt, numQueries = NumQ)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = ServingIngest.streamingIvfpqEncode(
      spark, in.toDF().toDF("vec_id", "embedding"), root, s"$root/ckpt")
    try {
      val rows = arrivalRows
      assert(rows.nonEmpty)
      // the arrivals land as TWO micro-batches
      rows.grouped((rows.length + 1) / 2).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      assert(graft.engine.VersionedTable.versions(spark,
        s"$root/arrival_codes").size === 2, "one codes snapshot per batch")
      // batch plan: ONE-SHOT encode of all arrivals against the same
      // frozen index, served next to the base codes
      val (c, b, baseCodes, _) = ServingIngest.loadIndex(spark, root)
      val oneShot = Clustering.ivfpqEncodeWith(
        Clustering.gridVecs(spark.read.parquet(s"$Sf/embeddings.parquet")
          .filter(col("vec_id") >= SplitAt)), c, b)
      val expected = Clustering.ivfpqTopkWith(spark, Sf, c, b,
        baseCodes.unionByName(oneShot), numQueries = NumQ).collect()
      val served = ServingIngest.snapshotTopk(spark, Sf, root,
        numQueries = NumQ).collect()
      assert(served.length === expected.length && served.length === NumQ * 10)
      served.zip(expected).foreach { case (a, e) =>
        assert(a === e, "snapshot-served ADC ranking must equal the batch plan bitwise")
      }
      // a replayed batch is a skipped commit: the served ranking is unchanged
      graft.engine.VersionedTable.commitIfAbsent(
        baseCodes.limit(5), s"$root/arrival_codes", 0L)
      val replayed = ServingIngest.snapshotTopk(spark, Sf, root,
        numQueries = NumQ).collect()
      assert(replayed === served, "replay must not alter the served ranking")
    } finally q.stop()
  }

  test("drift gate: calm arrivals do not fire; drifted arrivals republish a superseding index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sidx2").toString
    ServingIngest.publishBaseIndex(spark, Sf, root, SplitAt, numQueries = NumQ)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = ServingIngest.streamingIvfpqEncode(
      spark, in.toDF().toDF("vec_id", "embedding"), root, s"$root/ckpt")
    try {
      // batch 0: in-distribution arrivals (the corpus's own held-out tail)
      in.addData(arrivalRows.toIndexedSeq); q.processAllAvailable()
      assert(!ServingIngest.refreshIfDrifted(spark, root, NumQ),
        "in-distribution arrivals must not trigger a refresh")
      assert(graft.engine.VersionedTable.latestVersion(spark, s"$root/cents")
        === Some(0L))
      // batch 1: planted far-out vectors (every coordinate >> corpus range)
      val drifted = (9000L until 9032L).map(id =>
        (id, Array.fill(64)(8.0f + (id % 7).toFloat)))
      in.addData(drifted); q.processAllAvailable()
      assert(ServingIngest.refreshIfDrifted(spark, root, NumQ),
        "far-out arrivals must trigger the warm refresh")
      // republished at the fold watermark (last batchId 1 -> version 2)
      assert(graft.engine.VersionedTable.latestVersion(spark, s"$root/cents")
        === Some(2L))
      assert(graft.engine.VersionedTable.latestVersion(spark, s"$root/codes")
        === Some(2L))
      // served = refreshed codes only (all arrivals folded, none double-
      // counted): one code row set per corpus vector, queries excluded
      val served = ServingIngest.servedCodes(spark, root)
      val perVec = served.groupBy(col("vec_id")).count()
        .filter(col("count") =!= 8).count()
      assert(perVec === 0L, "every vector carries exactly one code per subspace")
      val expectedN = (SplitAt - NumQ) + arrivalRows.length + drifted.length
      assert(served.select(col("vec_id")).distinct().count() === expectedN)
      // the refreshed ranking is the batch plan on the refreshed frames
      val (c, b, codes, _) = ServingIngest.loadIndex(spark, root)
      val expect = Clustering.ivfpqTopkWith(spark, Sf, c, b, codes,
        numQueries = NumQ).collect()
      val got = ServingIngest.snapshotTopk(spark, Sf, root,
        numQueries = NumQ).collect()
      assert(got === expect)
    } finally q.stop()
  }
}
