package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.engine.Tables

/** Deduplication operators for LLM training-data pipelines over
  * `documents`: exact (hash-groupBy), exact n-gram Jaccard via an inverted
  * shingle index, MinHash+LSH (the 100 TB-scale path), and SimHash.
  *
  * Scale notes:
  *   - exact dedup is one hash-shuffle on the fingerprint — optimal;
  *   - the inverted-index Jaccard join explodes on hot shingles; it is the
  *     *exact* baseline the MinHash path is tested against, not the
  *     at-scale plan;
  *   - MinHash+LSH shuffles only (band, bandHash) buckets — skew-resistant
  *     (a bucket holds only near-identical docs) and linear in corpus
  *     size; this is the operator you run at 100 TB;
  *   - SimHash is a single projection (no shuffle at all) producing a
  *     64-bit sketch; near-dup = small Hamming distance.
  */
object Dedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Distinct n-word shingles (joined by single spaces) of a token array.
    * Guarded: fewer than n tokens -> empty array (Spark's `sequence` would
    * otherwise count *down* and fabricate shingles).
    */
  def wordShingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      array_distinct(transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, n)))))
      .otherwise(array().cast("array<string>"))

  /** documents -> (doc_id, shingles) with empty-shingle docs dropped. */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        wordShingles(TextAnalysis.wsTokens(lower(col("text"))), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Exact duplicate detection: canonical-text fingerprint, duplicate
    * count and canonical (minimum) doc id per group. One shuffle on the
    * 128-bit fingerprint — the plan of record at any scale.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val byFp = Window.partitionBy(col("fingerprint"))
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprintCol(col("text")).as("fingerprint"))
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("canonical_doc_id", min(col("doc_id")).over(byFp))
      .withColumn("is_canonical", col("doc_id") === col("canonical_doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Exact word-3-gram Jaccard: top-20 most similar pairs via an inverted
    * shingle index (pairs sharing zero shingles never materialize).
    */
  def jaccardTopk(s: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(s, dir)
    val counts = docs.select(col("doc_id"), size(col("shingles")).cast(LongType).as("n_sh"))
    val inv = docs.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val pairs = inv.as("a")
      .join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_common")).cast(DoubleType))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** MinHash signature: for each of `numHashes` hash families, the minimum
    * xxhash64(seed=i, shingle) over the doc's shingle set.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      i => array_min(transform(shingles, sh => xxhash64(i, sh))))

  /** MinHash + LSH banding: near-duplicate pairs with exact-Jaccard
    * verification. `bands` x `rowsPerBand` = signature length; docs
    * agreeing on all rows of any band land in the same bucket and become
    * a candidate pair; candidates are then verified with exact Jaccard.
    * No oracle (xxhash64 is Spark-specific); DedupSpec checks candidates
    * against the exact inverted-index result.
    */
  def minhashPairs(s: SparkSession, dir: String,
      bands: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame = {
    val docs = docShingles(s, dir)
      .withColumn("sig", minhashSignature(col("shingles"), bands * rowsPerBand))
    val banded = docs.select(
      col("doc_id"), col("shingles"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bucket"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
  }

  /** Precomputed bit masks 1L<<0 .. 1L<<63 (bitwise OR-folded — safe under
    * ANSI arithmetic, no additive overflow).
    */
  private val BitMasks: Column = typedLit((0 until 64).map(b => 1L << b))

  /** 64-bit SimHash of a token array: bit b is set iff the sum over tokens
    * of +-1 (per bit b of the token hash) is positive. Pure projection —
    * zero shuffle; near-dup = Hamming distance via bit_count(a XOR b).
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, tk => TextAnalysis.tokenHash(tk))
    val bits = transform(sequence(lit(0), lit(63)), b => {
      val mask = element_at(BitMasks, b + 1)
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0L, 1L).otherwise(-1L))
      when(vote > 0, mask).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, m) => acc.bitwiseOR(m))
  }

  /** SimHash sketch per document (rows-only query; DedupSpec asserts the
    * Hamming-distance near-dup property against exact Jaccard).
    */
  def simhashSketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        simhash64(TextAnalysis.wsTokens(lower(col("text")))).as("simhash"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x10_dedup_exact" -> (dedupExact _),
    "x11_jaccard_topk" -> (jaccardTopk _),
    "x12_minhash_pairs" -> ((s: SparkSession, dir: String) => minhashPairs(s, dir)),
    "x13_simhash" -> (simhashSketch _))

  val oracles: Map[String, String] = Map(
    "x10_dedup_exact" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        |  count(*) OVER (PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS n_copies,
        |  min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS canonical_doc_id,
        |  doc_id = min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS is_canonical
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x11_jaccard_topk" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0), 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents)
        |  WHERE len(w) >= 3)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) > 0
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin)
}
