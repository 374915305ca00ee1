package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-9 monitoring/eval operators — the
  * contracts their oracle twins verify only by end-to-end equality:
  * drift statistics live in their mathematical ranges and reduce to the
  * right totals, the kNN eval accounts for every query exactly once,
  * and frame overlap is consistent with exact payload duplication.
  */
class MonitoringOpsSpec extends SparkSpec {

  test("source drift: shares sum to 1 per half, TVD in [0,1], counts partition the corpus") {
    val rows = graft.ops.DataQuality.sourceDrift(spark, Sf).collect()
    assert(rows.nonEmpty)
    val total = graft.engine.Tables(spark, Sf, "documents").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "every document lands in exactly one (source, half) cell")
    val s1 = rows.map(_.getDouble(3)).sum
    val s2 = rows.map(_.getDouble(4)).sum
    assert(math.abs(s1 - 1.0) < 1e-9 && math.abs(s2 - 1.0) < 1e-9,
      s"shares must sum to 1: $s1, $s2")
    val tvds = rows.map(_.getDouble(5)).distinct
    assert(tvds.length == 1, "tvd_total is a single corpus-level value")
    assert(tvds.head >= 0.0 && tvds.head <= 1.0)
    // independent spelling: TVD = half the sum of absolute share diffs
    val byHand = rows.map(r => math.abs(r.getDouble(3) - r.getDouble(4))).sum / 2.0
    assert(math.abs(tvds.head - byHand) < 1e-9, s"${tvds.head} vs $byHand")
  }

  test("embedding drift: cosines in [-1,1], halves partition each label") {
    val rows = Similarity.embeddingDrift(spark, Sf).collect()
    assert(rows.nonEmpty)
    val perLabel = graft.engine.Tables(spark, Sf, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perLabel(r.getInt(0)),
        s"halves must partition label ${r.getInt(0)}")
      if (!r.isNullAt(3)) {
        val c = r.getDouble(3)
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"cosine out of range: $c")
      }
    }
    assert(rows.exists(!_.isNullAt(3)), "at least one label present in both halves")
  }

  test("knn label eval accounts for every query exactly once") {
    val rows = Similarity.knnLabelEval(spark, Sf).collect()
    assert(rows.map(_.getLong(1)).sum == 50L, "50 queries, each voted once")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
      assert(acc == r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("frame overlap: exact payload duplicates share all their sampled frames") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_frameovl").toString
    val body = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 40)
    // doc_ids 2, 5, 8 are 'video'; 2 and 8 carry identical payloads
    Seq((2L, body), (5L, "short unrelated " * 80), (8L, body), (11L, body.take(300)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Multimodal.frameOverlap(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expectFrames = (0 until (body.length / 256) by 4).map { f =>
      body.substring(f * 256, (f + 1) * 256)
    }.distinct.size
    // docs 2 and 8 (identical) share every sampled frame; doc 11 is a
    // 300-char PREFIX of the body, so it shares exactly frame 0 with both
    assert(got.toSeq == Seq((2L, 8L, expectFrames.toLong), (2L, 11L, 1L), (8L, 11L, 1L)),
      s"overlap counts: ${got.toSeq} (full=$expectFrames)")
  }
}
