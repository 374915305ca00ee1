package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-pruned semi join contracts: the sketch pre-filter must be a
  * pure optimization — identical output to the plain semi join — while
  * actually pruning the fact side (bounded false positives).
  */
class BloomJoinSpec extends SparkSpec {

  test("bloom pre-filter never loses a true match and bounds false positives") {
    val ev = graft.engine.Tables(spark, Sf, "events")
    val dim = graft.engine.Tables(spark, Sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    val sketch = BloomJoin.buildBloom(dim, "user_id", 100000L)
    val pruned = ev.filter(BloomJoin.mightContain(sketch, col("user_id")))
    // no false negatives: every true-match row survives the pre-filter
    val trueRows = ev.join(dim, Seq("user_id"), "left_semi").count()
    val prunedTrueRows = pruned.join(dim, Seq("user_id"), "left_semi").count()
    assert(prunedTrueRows == trueRows, "bloom filters must never drop a member")
    // real pruning with bounded false positives: the pass-through is
    // close to the true match count, far below the full table
    val total = ev.count()
    val passed = pruned.count()
    assert(passed >= trueRows)
    assert(passed < total, s"pre-filter must prune something ($passed of $total)")
    assert(passed <= trueRows + (total * 0.05).toLong,
      s"false-positive blowup: $passed passed vs $trueRows true of $total")
  }

  test("bloom semi reduction equals the plain semi join aggregate") {
    val viaBloom = BloomJoin.bloomSemiReduction(spark, Sf).collect().toSeq
    val dim = graft.engine.Tables(spark, Sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    val plain = graft.engine.Tables(spark, Sf, "events")
      .join(dim, Seq("user_id"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type")).collect().toSeq
    assert(viaBloom == plain)
  }

  test("x156 bloom contamination screen: planted cross-split dup is caught, bounds hold") {
    import spark.implicits._
    def h15(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def bucket(id: Long): String = {
      val b = h15(id.toString) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    // plant one text shared between a train-bucket doc and a test-bucket
    // doc (ids found by the same md5 rule hashSplit uses)
    val trainId = (0L to 500L).find(bucket(_) == "train").get
    val testId = (0L to 500L).find(bucket(_) == "test").get
    val cleanIds = (501L to 2000L).filter(bucket(_) == "train").take(50)
    val tmp = java.nio.file.Files.createTempDirectory("x156docs").toString
    val rows = Seq(
      (trainId, "the leaked shared document body", "en", "web", 31L),
      (testId, "THE LEAKED -- shared document body!", "en", "web", 35L)) ++
      cleanIds.zipWithIndex.map { case (id, i) =>
        (id, s"unique training document number $i", "en", "web", 33L)
      }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = BloomJoin.bloomContamination(spark, tmp).collect().head
    // the canonical fingerprint strips case + non-alnum, so the two
    // planted texts collide exactly
    assert(r.getAs[Long]("n_contaminated") === 1L)
    assert(r.getAs[Boolean]("no_false_negatives"), "bloom must never miss a true dup")
    assert(r.getAs[Boolean]("fp_bound_ok"))
    assert(r.getAs[Long]("n_train") === (1 + cleanIds.size).toLong)
    // the fixture corpus row must also gate green end-to-end
    val f = BloomJoin.bloomContamination(spark, Sf).collect().head
    assert(f.getAs[Boolean]("no_false_negatives") && f.getAs[Boolean]("fp_bound_ok"))
  }
}
