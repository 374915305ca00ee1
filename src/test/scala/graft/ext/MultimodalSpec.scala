package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The multimodal plumbing contract: the stub decode is deterministic,
  * results don't depend on partitioning (mapPartitions is pure), frames
  * sample only video payloads, and features are unit-length.
  */
class MultimodalSpec extends SparkSpec {

  test("media features are deterministic and partitioning-invariant") {
    val a = Multimodal.mediaFeatures(spark, Sf).toDF()
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.mediaFeatures(spark, Sf).toDF()
      .repartition(7)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a.nonEmpty && a.values.forall(_.length == 16))
  }

  test("features are L2-normalized") {
    Multimodal.mediaFeatures(spark, Sf).collect().foreach { f =>
      val n = math.sqrt(f.features.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble))
      assert(math.abs(n - 1.0) < 1e-3, s"norm $n for media ${f.media_id}")
    }
  }

  test("frame sampling covers only video rows with the declared stride") {
    val kinds = Multimodal.mediaTable(spark, Sf)
      .select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val frames = Multimodal.frameSample(spark, Sf).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(kinds(f.media_id) == "video")
      assert(f.frame_no % 4 == 0 && f.frame_bytes.length == 256)
    }
  }

  test("decode stub: known payload folds to the expected vector") {
    val v = Multimodal.decodeStub(Array[Byte](0, 127, -1, 0), 2)
    // buckets before normalization: [0 + 255/255, 127/255 + 0]
    val raw = Array(1.0f, 127f / 255f)
    val norm = math.sqrt(raw.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)).toFloat
    assert(v.zip(raw.map(_ / norm)).forall { case (x, y) => math.abs(x - y) < 1e-6 })
  }

  test("media payload bytes survive the binary column round trip") {
    val row = Multimodal.mediaTable(spark, Sf)
      .filter(col("media_id") === 1)
      .select("payload").head()
    val text = graft.engine.Tables(spark, Sf, "documents")
      .filter(col("doc_id") === 1).select("text").head().getString(0)
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == text)
  }
}
