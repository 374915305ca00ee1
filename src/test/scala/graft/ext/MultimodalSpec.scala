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

  test("flat-block JPEG round-trip is exact for every byte value") {
    // the x164 exactness law: quality-1.0 quant tables are all ones and
    // constant blocks are DC-only, so the LOSSY codec inverts exactly —
    // checked for all 256 values, not a sample
    val allv = Array.tabulate(256)(_.toByte)
    val enc = Multimodal.encodeGrayJpeg(allv, 16)
    val st = Multimodal.decodeImage(enc).get
    assert(st.width == 128 && st.height == 128)
    assert(st.pixelSum == allv.map(_ & 0xff).map(_.toLong).sum * 64,
      "decoded sum must be exactly 64x the byte sum")
    assert(st.pixelMax == 255)
    // per-pixel, not just the sum: every block uniform at its byte value
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    val r = img.getRaster
    for (i <- 0 until 256; y <- 0 until 8; x <- 0 until 8)
      assert(r.getSample((i % 16) * 8 + x, (i / 16) * 8 + y, 0) == i,
        s"block $i pixel ($x,$y)")
    // encoder byte-determinism (the fixture the oracle arithmetic pins)
    assert(java.util.Arrays.equals(enc, Multimodal.encodeGrayJpeg(allv, 16)))
  }

  test("x164 JPEG stats equal the byte arithmetic the oracle runs, incl. padding") {
    // an odd tail forces zero-padding blocks: sum unchanged, geometry grows
    val bytes = Array.tabulate(37)(i => (i * 7 % 256).toByte)
    val st = Multimodal.decodeImage(Multimodal.encodeGrayJpeg(bytes, 16)).get
    assert(st.width == 128 && st.height == 3 * 8 && st.nPixels == 3 * 1024L)
    assert(st.pixelSum == bytes.map(_ & 0xff).map(_.toLong).sum * 64)
    val rows = Multimodal.jpegDecodeStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.engine.Tables(spark, Sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val bs = texts(r.getLong(0)).getBytes("UTF-8").map(_ & 0xff)
      assert(r.getLong(1) == 128)
      assert(r.getLong(2) == math.max(1, (bs.length + 15) / 16) * 8L)
      assert(r.getLong(4) == bs.map(_.toLong).sum * 64, s"pixel_sum of ${r.getLong(0)}")
      assert(r.getLong(5) == bs.max.toLong, s"pixel_max of ${r.getLong(0)}")
    }
  }

  test("real WAV parser: PCM-16LE round-trip recovers exact sample values") {
    // includes a negative sample (0x8001 = -32767), the max-ish positive
    // (0x7fff = 32767), and an ODD byte count so the pad path runs
    val bytes = Array[Byte](0x01, 0x80.toByte, 0xff.toByte, 0x7f, 0x34, 0x12, 0x7b)
    val wav = Multimodal.encodeWavPcm16(bytes, sampleRate = 8000)
    val st = Multimodal.decodeWav(wav).get
    assert(st.sampleRate == 8000 && st.bitsPerSample == 16)
    assert(st.nSamples == 4, "7 bytes pad to 4 samples")
    val expected = Seq(-32767, 32767, 0x1234, 0x7b) // last = odd tail + 0 high
    assert(st.sampleSum == expected.sum.toLong)
    assert(st.sampleMin == expected.min && st.sampleMax == expected.max)
    assert(st.sampleHist.sum == 4 && st.sampleHist(0) == 1 && st.sampleHist(15) == 1,
      s"signed range must span the histogram: ${st.sampleHist.mkString(",")}")
  }

  test("WAV chunk walk skips unknown chunks and honors the odd-size pad") {
    val bytes = Array[Byte](1, 2, 3, 4)
    val wav = Multimodal.encodeWavPcm16(bytes)
    // splice an unknown odd-sized LIST chunk between fmt and data: a
    // parser that assumes data at offset 36 breaks; a real chunk walk
    // (with the RIFF pad byte after odd sizes) does not
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // patch the RIFF size (offset 4, LE) to cover the added bytes
    val riffSize = spliced.length - 8
    (0 until 4).foreach(i => spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte)
    val st = Multimodal.decodeWav(spliced).get
    val ref = Multimodal.decodeWav(wav).get
    // field-wise: the histogram is an Array, where == is reference equality
    def scalars(w: Multimodal.WavStats) = (w.sampleRate, w.bitsPerSample,
      w.nSamples, w.sampleSum, w.sampleMin, w.sampleMax)
    assert(scalars(st) == scalars(ref) && st.sampleHist.sameElements(ref.sampleHist),
      "stats must be identical with the LIST chunk spliced in")
  }

  test("WAV parser rejects non-RIFF, non-WAVE, and non-PCM16 payloads") {
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
    val wav = Multimodal.encodeWavPcm16(Array[Byte](1, 2, 3, 4))
    val notWave = wav.clone(); notWave(8) = 'X'.toByte
    assert(Multimodal.decodeWav(notWave).isEmpty)
    val notPcm = wav.clone(); notPcm(20) = 3 // audio format 3 = IEEE float
    assert(Multimodal.decodeWav(notPcm).isEmpty)
    val truncated = wav.take(30) // data chunk header missing entirely
    assert(Multimodal.decodeWav(truncated).isEmpty)
  }

  test("featurize dispatch: a genuine WAV under kind=audio takes the real parser") {
    val wav = Multimodal.encodeWavPcm16(Array[Byte](9, 8, 7, 6, 5, 4))
    val (feats, digest, real) = Multimodal.featurize("audio", wav, 16)
    assert(real, "a genuine WAV under kind=audio must take the real parser")
    val hist = Multimodal.decodeWav(wav, 16).get.sampleHist
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectedDigest = md.digest(hist.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(digest == expectedDigest, "digest is the md5 of the exact bin counts")
    val n = math.sqrt(feats.foldLeft(0.0)((s, v) => s + v.toDouble * v))
    assert(math.abs(n - 1.0) < 1e-6)
    // same bytes under kind=video -> stub (video has no real lane yet)
    assert(!Multimodal.featurize("video", wav, 16)._3)
  }

  test("x115 sample stats equal the LE byte arithmetic the oracle runs") {
    val rows = Multimodal.audioDecodeStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.engine.Tables(spark, Sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val b = texts(r.getLong(0)).getBytes("UTF-8").map(_ & 0xff)
      val samples = b.grouped(2).map {
        case Array(lo, hi) => ((lo | (hi << 8)).toShort).toInt
        case Array(lo) => lo
      }.toSeq
      assert(r.getLong(1) == 16000L)
      assert(r.getLong(2) == samples.length.toLong, s"n_samples of ${r.getLong(0)}")
      assert(r.getLong(3) == samples.map(_.toLong).sum, s"sample_sum of ${r.getLong(0)}")
      assert(r.getLong(4) == samples.min.toLong && r.getLong(5) == samples.max.toLong)
    }
  }

  test("real GIF decoder: animated round-trip recovers every frame's samples") {
    // 600 bytes at 16x16 -> 3 frames, the last 88 pixels zero-padded
    val bytes = Array.tabulate[Byte](600)(i => ((i * 31 + 7) % 256).toByte)
    val gif = Multimodal.encodeGrayGif(bytes, 16, 16)
    assert(new String(gif, 0, 6, "US-ASCII") == "GIF89a")
    val frames = Multimodal.decodeGifFrames(gif).get
    assert(frames.length == 3)
    frames.zipWithIndex.foreach { case (st, f) =>
      assert(st.width == 16 && st.height == 16)
      val slice = bytes.slice(f * 256, math.min(bytes.length, (f + 1) * 256))
        .map(_ & 0xff)
      assert(st.pixelSum == slice.map(_.toLong).sum, s"frame $f sum")
      assert(st.pixelMax == slice.max, s"frame $f max")
      assert(st.grayHist.sum == 256, s"frame $f histogram counts every pixel")
    }
  }

  test("GIF decoder rejects non-GIF payloads") {
    assert(Multimodal.decodeGifFrames("definitely not a gif".getBytes).isEmpty)
    assert(Multimodal.decodeGifFrames(Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.decodeGifFrames(
      Multimodal.encodeWavPcm16(Array[Byte](1, 2, 3, 4))).isEmpty,
      "a WAV under the GIF parser is refused, not misread")
  }

  test("featurize dispatch: a genuine animated GIF under kind=video is real") {
    val gif = Multimodal.encodeGrayGif(Array.tabulate[Byte](300)(_.toByte), 16, 16)
    val (feats, digest, real) = Multimodal.featurize("video", gif, 16)
    assert(real, "a genuine GIF under kind=video must take the real decoder")
    val hist = Multimodal.decodeGifFrames(gif, 16).get
      .map(_.grayHist).reduce((a, b) => a.zip(b).map(p => p._1 + p._2))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(hist.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(digest == expected)
    val n = math.sqrt(feats.foldLeft(0.0)((s, v) => s + v.toDouble * v))
    assert(math.abs(n - 1.0) < 1e-6)
    // raw (non-GIF) video payloads still ride the documented stub
    assert(!Multimodal.featurize("video", "raw clip bytes".getBytes, 16)._3)
  }

  test("x119 per-frame stats equal the byte arithmetic the oracle runs") {
    val rows = Multimodal.videoDecodeStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.engine.Tables(spark, Sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, fr) =>
      val b = texts(id).getBytes("UTF-8").map(_ & 0xff)
      assert(fr.length == (b.length + 255) / 256, s"frame count of $id")
      fr.foreach { r =>
        val f = r.getLong(1).toInt
        val slice = b.slice(f * 256, math.min(b.length, (f + 1) * 256))
        assert(r.getLong(2) == 256L)
        assert(r.getLong(3) == slice.map(_.toLong).sum, s"pixel_sum of $id/$f")
        assert(r.getLong(4) == slice.max.toLong, s"pixel_max of $id/$f")
      }
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

  test("x180: aHash bits follow the cell-average law and survive the PNG round-trip") {
    // constant grid: every cell average equals the global average → all '1'
    assert(Multimodal.aHashBits(16, 16, Array.fill(256)(7)) === "1" * 64)
    // top half dark, bottom half bright → rows 0-3 of cells '0', rows 4-7 '1'
    val grad = Array.tabulate(16 * 16)(i => if (i / 16 < 8) 0 else 255)
    assert(Multimodal.aHashBits(16, 16, grad) === "0" * 32 + "1" * 32)
    // perceptual robustness: one flipped pixel leaves the hash unchanged
    // (the property that separates aHash from x66's exact md5 dedup)
    val base = Array.tabulate(32 * 32)(i => if (i / 32 < 16) 0 else 200)
    val tweaked = base.clone(); tweaked(5) = 10
    assert(Multimodal.aHashBits(32, 32, base) === Multimodal.aHashBits(32, 32, tweaked))
    // end-to-end: the REAL PNG round-trip hashes identically to the raw grid
    val bytes = Array.tabulate(300)(i => ((i * 37) % 251).toByte)
    val (w, h, px) = Multimodal.decodeGrayPixels(
      Multimodal.encodeGrayPng(bytes, 32)).get
    assert(w === 32 && h === 10)
    val raw = Array.tabulate(w * h)(i =>
      if (i < bytes.length) bytes(i) & 0xff else 0)
    assert(px.toSeq === raw.toSeq, "PNG round-trip must be lossless")
    assert(Multimodal.aHashBits(w, h, px) === Multimodal.aHashBits(w, h, raw))
  }
}
