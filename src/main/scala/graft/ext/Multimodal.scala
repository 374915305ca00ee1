package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.engine.Tables

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the per-batch decode -> feature-extract -> sample
  * plumbing a training-data pipeline needs.
  *
  * The container has no media codecs, so `decodeStub` is a DETERMINISTIC
  * FAKE standing in for the real decoder (it derives "samples" from the
  * payload bytes themselves); everything around it — the schema, the
  * typed Dataset shape, iterator-to-iterator `mapPartitions` batching,
  * partition-count invariance — is the real Spark plumbing and is
  * tested. Swapping the stub for an actual codec changes one function.
  *
  * Scale shape: the heavy lane (payload bytes) flows map-side only —
  * decode/featurize is `mapPartitions` with no shuffle; only the small
  * feature vectors and metadata ever hit an exchange. That is the shape
  * that survives 100 TB of media: bytes stay where they were read.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media derived from `documents`: the text
    * bytes play the opaque payload, the kind cycles image/audio/video,
    * and the metadata columns are derived but typed exactly as a real
    * media table would be.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(4)) * 160 + lit(320)).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(4)) * 90 + lit(180)).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"))

  /** STUB — stands in for the real image/audio decoder (no codec libs in
    * this container). Deterministic: folds payload bytes into a
    * fixed-width float vector, L2-normalized. A real implementation
    * would decode pixels/samples and run the same signature.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val norm = math.sqrt(acc.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble)).toFloat
    if (norm == 0f) acc else acc.map(_ / norm)
  }

  /** decode + featurize as one iterator-to-iterator pass: batch-shaped
    * (no per-row driver calls, no shuffle), payload bytes never leave
    * the input partition.
    */
  def mediaFeatures(s: SparkSession, dir: String, dim: Int = 16): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decodeStub(r.payload, dim))
      }
    }
  }

  /** Frame sampling for `video` payloads: every `stride`-th fixed-size
    * chunk of the payload becomes a frame row. One generator pass,
    * map-side; the per-frame rows carry only their own bytes.
    */
  def frameSample(s: SparkSession, dir: String,
      frameSize: Int = 256, stride: Int = 4): Dataset[Frame] = {
    import s.implicits._
    mediaTable(s, dir).filter(col("kind") === "video").as[MediaRow]
      .flatMap { r =>
        val nFrames = r.payload.length / frameSize
        (0 until nFrames by stride).map { f =>
          Frame(r.media_id, f, java.util.Arrays.copyOfRange(
            r.payload, f * frameSize, (f + 1) * frameSize))
        }
      }
  }

  /** Exact media dedup: group payloads by their binary md5 — the
    * asset-level dedup pass a multimodal corpus runs before any decode
    * (duplicate images/clips are the norm in web crawls, and hashing
    * skips the expensive lane entirely). One shuffle on the 128-bit
    * digest; payload bytes never leave the map side — only (id, md5)
    * rides the exchange. Unlike the decode stub this IS oracle-checkable:
    * the digest of the payload bytes is engine-independent.
    */
  def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byMd5 = Window.partitionBy(col("payload_md5"))
    mediaTable(s, dir)
      .select(col("media_id"), col("kind"),
        md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("n_copies", count(lit(1)).over(byMd5))
      .withColumn("canonical_media_id", min(col("media_id")).over(byMd5))
      .withColumn("is_canonical", col("media_id") === col("canonical_media_id"))
      .orderBy(col("media_id"))
  }

  /** Rows-only driver queries (binary payloads and the stubbed decode
    * have no DuckDB twin); MultimodalSpec pins determinism and
    * partitioning invariance.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x66_media_dedup" -> (mediaDedup _),
    "x30_media_features" -> ((s: SparkSession, dir: String) =>
      // feature vector rides as a scalar checksum: the driver's pandas
      // compare cannot sort list columns, and the stub vector itself is
      // covered by MultimodalSpec's determinism assertions
      mediaFeatures(s, dir).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(expr(
            "aggregate(features, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"),
            6).as("feature_checksum"))
        .orderBy(col("media_id"))),
    "x31_frame_sample" -> ((s: SparkSession, dir: String) =>
      frameSample(s, dir).toDF()
        .select(col("media_id"), col("frame_no"), length(col("frame_bytes")).as("frame_len"))
        .orderBy(col("media_id"), col("frame_no"))))

  /** x66's payload is the documents' UTF-8 bytes, so DuckDB's md5 of the
    * VARCHAR (it hashes the UTF-8 encoding) and strlen (byte length)
    * reproduce the Spark-side binary digest and length exactly.
    */
  val oracles: Map[String, String] = Map(
    "x66_media_dedup" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  md5(text) AS payload_md5,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  count(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_media_id,
        |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        |FROM documents ORDER BY media_id""".stripMargin)
}
