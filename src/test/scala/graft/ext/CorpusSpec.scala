package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge semantics of the corpus-preparation operators the oracle can't
  * see: chunk coverage/overlap invariants on crafted documents, redaction
  * completeness, and the encode/decode contract of vocabulary ids.
  */
class CorpusSpec extends SparkSpec {

  private def docsOf(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("chunker covers every token exactly once at overlap 0") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Corpus.chunksOf(docsOf(1L -> words), chunkSize = 32, overlap = 0)
      .orderBy(col("chunk_idx")).collect()
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(32L, 32L, 32L, 4L))
  }

  test("chunker with overlap re-reads exactly `overlap` tokens per boundary") {
    val words = (1 to 80).map(i => s"w$i").mkString(" ")
    val out = Corpus.chunksOf(docsOf(1L -> words), chunkSize = 32, overlap = 8)
      .orderBy(col("chunk_idx")).collect()
    // stride 24: starts at 0, 24, 48, 72 -> sizes 32, 32, 32, 8
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(32L, 32L, 32L, 8L))
    val total = out.map(_.getAs[Long]("n_chunk_tokens")).sum
    assert(total === 80L + 8L * 3, "each interior boundary re-reads `overlap` tokens")
  }

  test("short documents produce a single short chunk") {
    val out = Corpus.chunksOf(docsOf(1L -> "a b c"), chunkSize = 32, overlap = 8).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_chunk_tokens") === 3L)
  }

  test("identical chunks hash identically across documents, distinct ones differ") {
    val words = (1 to 32).map(i => s"w$i").mkString(" ")
    val other = (1 to 32).map(i => s"v$i").mkString(" ")
    val out = Corpus.chunksOf(docsOf(1L -> words, 2L -> words, 3L -> other), 32, 0)
      .select("doc_id", "chunk_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
  }

  test("chunk scrub drops repeated blocks and reassembles the exact survivor text") {
    // doc 1: blocks A B A (the third block repeats the first); doc 2:
    // blocks B C (B already seen in doc 1). Survivors: doc1 = A B,
    // doc2 = C.
    val a = (1 to 32).map(i => s"a$i").mkString(" ")
    val b = (1 to 32).map(i => s"b$i").mkString(" ")
    val c = (1 to 32).map(i => s"c$i").mkString(" ")
    val out = Corpus.chunkScrubOf(
      docsOf(1L -> s"$a $b $a", 2L -> s"$b $c"), chunkSize = 32)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("tokens_kept"), r.getAs[String]("scrubbed_md5")))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) == ((3L, 2L, 64L, md5hex(s"$a $b"))))
    assert(out(2L) == ((2L, 1L, 32L, md5hex(c))))
  }

  test("chunk scrub of an entirely-duplicated document is the empty string") {
    val a = (1 to 32).map(i => s"a$i").mkString(" ")
    val out = Corpus.chunkScrubOf(docsOf(1L -> a, 2L -> a), chunkSize = 32)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("scrubbed_md5")))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) == ((1L, md5hex(a))), "first occurrence is canonical")
    assert(out(2L) == ((0L, md5hex(""))), "a fully-scrubbed doc reassembles to ''")
  }

  test("chunk scrub agrees with chunk dedup on what survives") {
    val scrub = Corpus.chunkScrub(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept")))).toMap
    val dedup = Corpus.chunkDedup(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_chunks") - r.getAs[Long]("n_dup_chunks"),
          r.getAs[Long]("tokens_kept")))).toMap
    assert(scrub == dedup, "same canonical order, same survivors")
  }

  test("redaction removes every PII pattern and counts match occurrences") {
    val rows = Corpus.piiRedaction(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.matches(s".*${Corpus.PiiEmail}.*"), s"email survived: $red")
      assert(!Corpus.PiiPhone.r.findFirstIn(red).isDefined, s"phone survived: $red")
      assert(!Corpus.PiiLongId.r.findFirstIn(red).isDefined, s"long id survived: $red")
      assert(r.getAs[Long]("n_emails") >= 1L)
      assert(r.getAs[Long]("n_phones") === 1L)
      assert(r.getAs[Long]("n_ids") === 1L)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<ID>"))
    }
  }

  test("vocab encoding: id count equals token count, OOV ids are 0, in-vocab ids invert") {
    val enc = Corpus.vocabEncode(spark, Sf, vocabSize = 40).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val ids = r.getAs[String]("ids").split(",")
      assert(ids.length.toLong === r.getAs[Long]("n_tokens"))
      assert(ids.count(_ == "0").toLong === r.getAs[Long]("n_oov"))
      assert(ids.forall(s => s.toLong >= 0L && s.toLong <= 40L))
    }
  }

  test("chunk dedup marks repeated blocks as duplicates, first occurrence canonical") {
    val block = (1 to 32).map(i => s"w$i").mkString(" ")
    val uniqueA = (1 to 32).map(i => s"a$i").mkString(" ")
    val uniqueB = (1 to 32).map(i => s"b$i").mkString(" ")
    // doc 1 = [block, uniqueA]; doc 2 = [block, uniqueB] -> doc 2's first
    // block is a duplicate of doc 1's
    val docs = docsOf(1L -> s"$block $uniqueA", 2L -> s"$block $uniqueB")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_idx"))
    val out = Corpus.chunksOf(docs, 32, 0)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("rn") === 1, 0L).otherwise(1L)).as("n_dup_chunks"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_dup_chunks")).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 1L)
  }
}
