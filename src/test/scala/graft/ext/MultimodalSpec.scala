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

  test("real JDK decoder: PNG round-trip recovers exact pixel values") {
    val bytes = Array[Byte](0, 1, 127, -1, 64, 65, 66) // incl. 255 unsigned
    val png = Multimodal.encodeGrayPng(bytes, 3) // 3 wide -> 3 rows, 2 pad zeros
    val st = Multimodal.decodeImage(png).get
    assert(st.width == 3 && st.height == 3 && st.nPixels == 9)
    assert(st.pixelSum == bytes.map(_ & 0xff).map(_.toLong).sum,
      "lossless round-trip: decoded pixel sum == byte sum")
    assert(st.pixelMax == 255)
    assert(st.grayHist.sum == 9 && st.grayHist(15) == 1, // the 255 pixel
      s"histogram must count every pixel: ${st.grayHist.mkString(",")}")
  }

  test("featurize dispatch: real decode for decodable images, stub otherwise") {
    val png = Multimodal.encodeGrayPng(Array[Byte](10, 20, 30, 40), 2)
    val (feats, _, real) = Multimodal.featurize("image", png, 16)
    assert(real, "a genuine PNG under kind=image must take the real decoder")
    val n = math.sqrt(feats.foldLeft(0.0)((s, v) => s + v.toDouble * v))
    assert(math.abs(n - 1.0) < 1e-6, "histogram features are L2-normalized")
    // same bytes under kind=audio -> stub; garbage under image -> stub
    assert(!Multimodal.featurize("audio", png, 16)._3)
    assert(!Multimodal.featurize("image", "not a png".getBytes, 16)._3)
    assert(Multimodal.decodeImage("junk".getBytes).isEmpty)
  }

  test("x111 pixel stats equal the byte arithmetic the oracle runs") {
    val rows = Multimodal.imageDecodeStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.engine.Tables(spark, Sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8").map(_ & 0xff)
      assert(r.getLong(1) == 32)
      assert(r.getLong(2) == math.max(1, (bytes.length + 31) / 32))
      assert(r.getLong(4) == bytes.map(_.toLong).sum, s"pixel_sum of ${r.getLong(0)}")
      assert(r.getLong(5) == bytes.max.toLong, s"pixel_max of ${r.getLong(0)}")
    }
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
