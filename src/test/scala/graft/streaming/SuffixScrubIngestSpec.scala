package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming exact-substring scrub contract: an arriving document
  * loses exactly the L-token windows already present in the standing
  * corpus or duplicated within its own batch; cross-batch matches ride
  * the committed snapshots; replay is a no-op.
  */
class SuffixScrubIngestSpec extends SparkSpec {

  private val L = graft.ext.SuffixDedup.MinMatchTokens // 8

  private def toks(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("scrubBatch cuts standing-corpus runs and within-batch duplicates, exactly") {
    import spark.implicits._
    // standing doc: 12 tokens s1..s12
    val standing = graft.ext.SuffixDedup
      .gramHashesOf(Seq((0L, toks(12, "s"))).toDF("doc_id", "text"), L)
      .select(col("ghash"))
    // batch doc 10: novel prefix + the standing run s3..s12 (10 tokens)
    // batch docs 11/12: share a duplicated 9-token run d1..d9; doc 13 novel
    val run = (3 to 12).map(i => s"s$i").mkString(" ")
    val dup = toks(9, "d")
    val batch = Seq(
      (10L, s"${toks(6, "n")} $run"),
      (11L, s"${toks(3, "p")} $dup"),
      (12L, s"$dup ${toks(3, "q")}"),
      (13L, toks(16, "z"))).toDF("doc_id", "text")
    val got = SuffixScrubIngest.scrubBatch(batch, standing)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 10: 16 tokens, the 10-token standing run is covered (3 window
    // starts at pos 6,7,8 → union covers pos 6..15)
    assert(got(10L) === ((16L, 10L, 6L)))
    // docs 11/12: the 9-token dup run covered in both (2 window starts)
    assert(got(11L) === ((12L, 9L, 3L)))
    assert(got(12L) === ((12L, 9L, 3L)))
    // doc 13: untouched
    assert(got(13L) === ((16L, 0L, 16L)))
  }

  test("scrubBatch leaves sub-L overlaps alone (threshold is exact)") {
    import spark.implicits._
    val standing = graft.ext.SuffixDedup
      .gramHashesOf(Seq((0L, toks(12, "s"))).toDF("doc_id", "text"), L)
      .select(col("ghash"))
    // only a 7-token overlap with the standing doc: below L=8, kept whole
    val run7 = (3 to 9).map(i => s"s$i").mkString(" ")
    val got = SuffixScrubIngest
      .scrubBatch(Seq((20L, s"${toks(5, "n")} $run7")).toDF("doc_id", "text"), standing)
      .collect().head
    assert(got.getLong(3) === 0L, "7-token overlap must survive at L=8")
  }

  test("streaming scrub matches the sequential batch twin and replays exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_sscrub").toString
    val root = s"$dirs/docs"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = SuffixScrubIngest.streamingSuffixScrub(spark,
      in.toDF().toDF("doc_id", "text"), Sf, root, s"$dirs/ckpt")
    try {
      val b1 = Seq((5000L, toks(20, "aa")), (5001L, toks(16, "bb")))
      in.addData(b1: _*)
      q.processAllAvailable()
      // batch 2 repeats an 8-token run from batch 1's RAW text: the
      // committed snapshot must supply the grams
      val run = (1 to 8).map(i => s"aa$i").mkString(" ")
      val b2 = Seq((5002L, s"${toks(5, "cc")} $run"), (5003L, toks(14, "dd")))
      in.addData(b2: _*)
      q.processAllAvailable()
      def snap(v: Long) = graft.engine.VersionedTable.read(spark, root, Some(v))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_cut"), r.getAs[String]("scrubbed_md5"))).toMap
      // sequential batch twins over the same state
      val t1 = SuffixScrubIngest.scrubBatch(b1.toDF("doc_id", "text"),
        SuffixScrubIngest.standingGramHashes(spark, Sf, s"$dirs/none"))
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(5))).toMap
      assert(snap(0L) === t1, "batch 0 must equal the batch twin")
      assert(snap(0L)(5000L)._1 === 0L, "novel docs arrive uncut")
      assert(snap(1L)(5002L)._1 === 8L, "the batch-1 run must be cut via the snapshot state")
      assert(snap(1L)(5003L)._1 === 0L)
      // replay of batch 0 is a skipped commit
      graft.engine.VersionedTable.commitIfAbsent(
        spark.range(1).selectExpr("99L AS doc_id", "'x' AS text", "1L AS n_tokens",
          "0L AS n_cut", "1L AS n_kept", "'z' AS scrubbed_md5"),
        root, 0L)
      assert(snap(0L) === t1, "replay must not alter the snapshot")
    } finally q.stop()
  }

  test("x172: the graded twin exercises both coverage branches on the fixture") {
    val rows = SuffixScrubIngest.scrubIngestTwin(spark, Sf, splitAt = 25L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) === r.getLong(2), "n_cut + n_kept = n_tokens")
    }
    assert(rows.exists(_.getLong(3) > 0L),
      "fixture near-dups must produce at least one cut batch doc")
    assert(rows.exists(r => r.getLong(3) === 0L && r.getLong(4) > 0L),
      "some batch doc must survive uncut")
  }
}
