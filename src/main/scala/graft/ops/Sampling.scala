package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Tables

/** Deterministic sampling / dataset splitting — the reproducibility
  * primitive a training-data pipeline needs: train/val/test membership
  * must be a pure function of the row key (stable across runs, engines,
  * partitionings, and cluster sizes), never `rand()` (whose draw order
  * depends on partitioning) and never a sampled-once materialized list
  * (which has to be joined everywhere).
  *
  * The hash is the md5-prefix integer both engines compute identically
  * (the same cross-engine trick `TextAnalysis.tokenHash` uses), bucketed
  * modulo 100: row -> bucket is uniform, deterministic, and computable
  * as a pure projection at any scale — the split never shuffles.
  */
object Sampling {

  /** Uniform deterministic bucket in [0, buckets) from a key column. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast(LongType), lit(buckets.toLong))

  /** 80/10/10 train/val/test assignment over `documents`. */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        hashBucket(col("doc_id"), 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))

  /** Stratified deterministic sample: per-language keep rates (50% of
    * English, 20% of everything else) applied through the same hash
    * bucket — the downsample-the-majority-class move, reproducible by
    * construction.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket(col("doc_id"), 100))
      .filter(
        when(col("lang") === "en", col("bucket") < 50)
          .otherwise(col("bucket") < 20))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Sequence-packing manifest: within each train/val/test split,
    * documents stream in deterministic doc_id order into fixed
    * token-budget bins — bin = floor(prefix_sum_before / budget), the
    * contiguous-fill packing a pre-training dataloader chunks from. The
    * cumulative sum runs PER SPLIT (a keyed window, parallel across
    * splits — at corpus scale the partition key is the finer shard id,
    * never a global order-by, which would serialize the corpus through
    * one task). The per-bin rollup reports the fill the loader relies
    * on; token counts are the verified whitespace spelling.
    */
  def sequencePacking(s: SparkSession, dir: String, budget: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("split")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hashSplit(s, dir).select(col("doc_id"), col("split"))
      .join(Tables(s, dir, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens")), "doc_id")
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("tokens_before") / budget))
      .groupBy(col("split"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("split"), col("bin"))
  }

  /** Domain-mixture rebalancing: sample the corpus down to `share` of its
    * size with the budget spread EQUALLY across (lang, source) groups —
    * the mixture-ratio control a pre-training data recipe applies (cap
    * the over-represented crawl slices, keep all of the rare ones). Each
    * group's quota is min(group size, ceil(total * share / n_groups));
    * WHICH rows fill a quota is decided by ranking on the deterministic
    * hash bucket then doc_id — a pure function of the key, stable across
    * runs/engines/partitionings like every sampler here. The group stats
    * are two tiny aggregates broadcast back onto the corpus; the rank is
    * a per-group window — no global sort, scales with the widest group.
    */
  def mixtureRebalance(s: SparkSession, dir: String, share: Double = 0.6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"), col("source"))
    val groups = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_group"))
    val totals = groups.agg(sum(col("n_group")).cast(LongType).as("n_total"),
      count(lit(1)).as("n_groups"))
    val quotas = groups.crossJoin(broadcast(totals))
      .select(col("lang"), col("source"), col("n_group"),
        least(col("n_group"),
          ceil(col("n_total").cast("double") * lit(share) / col("n_groups").cast("double"))
            .cast(LongType)).as("quota"))
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(hashBucket(col("doc_id"), 1000000), col("doc_id"))
    docs.withColumn("rnk", row_number().over(w).cast(LongType))
      .join(broadcast(quotas.select(col("lang"), col("source"), col("quota"))),
        Seq("lang", "source"))
      .select(col("doc_id"), col("lang"), col("source"), col("quota"), col("rnk"),
        (col("rnk") <= col("quota")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic global shuffle + sharding — the "shuffle the corpus
    * before training" primitive. Random order must be reproducible and
    * engine-independent, so the sort key is the md5 hex digest of a
    * seeded key (uniform, collision-free in practice), never `rand()`.
    * Rows land in `shards` shards by digest prefix and get a position
    * WITHIN their shard (row_number per shard partition) — so at 100 TB
    * this is one hash shuffle plus a per-shard sort; no global order-by
    * ever materializes, and a dataloader reads shard files independently
    * in (shard, pos) order.
    */
  def globalShuffle(s: SparkSession, dir: String,
      seed: String = "shuf42", shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digest = md5(concat(lit(seed + ":"), col("doc_id").cast("string")).cast("binary"))
    val w = Window.partitionBy(col("shard")).orderBy(col("digest"), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), digest.as("digest"))
      .withColumn("shard",
        pmod(conv(substring(col("digest"), 1, 15), 16, 10).cast(LongType),
          lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Temperature-scaled mixture sampling (the multilingual-pretraining
    * rebalance: weight each language by n^alpha, alpha<1 upsamples the
    * tail relative to its natural share). Budget = ceil(25% of corpus);
    * each language's target = min(its size, ceil(budget * its softened
    * share)). WHICH docs fill a target is the deterministic hash rank
    * within the language, like every sampler here. Two tiny aggregates
    * broadcast back, one per-language window — no global sort. Doubles
    * (sqrt, one division, one multiply) evaluate in the same fixed order
    * in both engines, so keep/target hash-gate.
    */
  def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
    val groups = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    // alpha = 0.5: weight = sqrt(n), QUANTIZED to an exact integer
    // (floor(sqrt(n) * 1e6)) before the cross-group total — a raw double
    // sum over groups is addition-order-dependent, so the engines could
    // disagree in the last bit; integer sums are exact in any order.
    // sqrt itself is IEEE correctly-rounded, identical in both engines.
    val weighted = groups.withColumn("wt_q",
      floor(sqrt(col("n_lang").cast("double")) * 1e6).cast(LongType))
    val totals = weighted.agg(
      sum(col("n_lang")).cast(LongType).as("n_total"),
      sum(col("wt_q")).cast(LongType).as("wtq_total"))
    val quotas = weighted.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_lang"),
        least(col("n_lang"),
          ceil(ceil(col("n_total").cast("double") * 0.25)
            * (col("wt_q").cast("double") / col("wtq_total").cast("double")))
            .cast(LongType)).as("target"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(hashBucket(col("doc_id"), 1000000), col("doc_id"))
    docs.withColumn("rnk", row_number().over(w).cast(LongType))
      .join(broadcast(quotas), "lang")
      .select(col("doc_id"), col("lang"), col("n_lang"), col("target"),
        (col("rnk") <= col("target")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing WITH document splitting — the real dataloader
    * contract x46 approximates: a document whose tokens overflow its bin
    * CONTINUES into the next bin (x46 lets bins overflow instead). From
    * each split's running prefix sum B and doc length n, the spanned
    * bins are floor(B/W)..floor((B+n-1)/W); each (doc, bin) row takes
    * min(B+n, (b+1)W) - max(B, bW) tokens at offset max(B, bW) - bW.
    * Pure integer arithmetic off ONE per-split window pass + a bounded
    * explode (a doc spans ceil(n/W)+1 bins at most) — every bin except
    * each split's last is EXACTLY full, which is the property a fixed-
    * shape training batch needs and the spec asserts.
    */
  def packedSequences(s: SparkSession, dir: String, budget: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("split")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val W = lit(budget)
    hashSplit(s, dir).select(col("doc_id"), col("split"))
      .join(Tables(s, dir, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens")), "doc_id")
      .withColumn("b0", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin",
        explode(sequence(floor(col("b0") / W), floor((col("b0") + col("n_tokens") - 1) / W))))
      .withColumn("start_tok", greatest(col("b0"), col("bin") * W))
      .withColumn("end_tok", least(col("b0") + col("n_tokens"), (col("bin") + 1) * W))
      .select(col("split"), col("bin"), col("doc_id"),
        (col("start_tok") - col("bin") * W).as("offset_in_bin"),
        (col("end_tok") - col("start_tok")).as("tokens_taken"),
        (col("start_tok") === col("b0")).as("is_head"))
      .orderBy(col("split"), col("bin"), col("offset_in_bin"), col("doc_id"))
  }

  /** Power-of-two length-bucket boundaries for the batching report —
    * shared between the Spark CASE chain and the DuckDB twin.
    */
  private val LengthBounds: Seq[Long] =
    Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L)
  private val LengthCap = 16384L

  /** Length-bucketed batching report — the dataloader alternative to
    * x46/x76's sequence packing: documents grouped into power-of-two
    * length buckets (each batch padded to its bucket's upper bound), per
    * bucket the doc/token counts, padded slots, padding waste, and
    * padding efficiency. This is the report that decides between
    * bucketed batching and packing for a training run; the bucket
    * assignment is a pure integer CASE chain (identical in both
    * engines), every count an exact integer, efficiency one double
    * division — zero shuffles beyond the one bucket-grain aggregate.
    */
  def lengthBatching(s: SparkSession, dir: String): DataFrame = {
    val nToks = size(split(trim(col("text")), "\\s+")).cast(LongType)
    val bucket = LengthBounds.foldRight(lit(LengthCap): Column) {
      (b, acc) => when(col("n_tokens") <= b, lit(b)).otherwise(acc)
    }
    Tables(s, dir, "documents")
      .select(col("doc_id"), nToks.as("n_tokens"))
      .withColumn("bucket_len", bucket)
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("n_tokens"),
        (col("n_docs") * col("bucket_len")).as("n_padded_slots"),
        (col("n_docs") * col("bucket_len") - col("n_tokens")).as("n_pad_waste"),
        (col("n_tokens").cast("double")
          / (col("n_docs") * col("bucket_len")).cast("double")).as("pad_efficiency"))
      .orderBy(col("bucket_len"))
  }

  /** Systematic PPS (probability-proportional-to-size) sampling,
    * integer-exact: lay the documents on a weight axis in doc_id order
    * (weight = n_chars — the "sample long documents proportionally
    * more" curation move), drop a boundary every `step = total div k`
    * units, and select each document once per boundary its weight span
    * crosses: `n_picks = cum div step - (cum - w) div step`. Everything
    * is BIGINT arithmetic on exact prefix sums — no float inclusion
    * probability whose last ulp could flip a pick — so the selection
    * hash-gates cross-engine, and it is reproducible by construction
    * (a pure function of the corpus, like `hashBucket`).
    *
    * Scale shape — no global-order window: the exact global prefix sum
    * is the classic two-phase scan, all narrow. Range-partition by
    * doc_id, per-partition windows (parallel), aggregate one total per
    * partition (a partitions-sized frame), window THAT tiny frame into
    * exclusive offsets, and broadcast them back. The corpus never
    * serializes through a single task — the single-partition
    * `Window.orderBy` this replaces is exactly the 1000-executor
    * bottleneck. Result values are partitioning-independent: cum(doc)
    * = Σ w over doc_id ≤ doc regardless of where range bounds fall.
    */
  def ppsSample(s: SparkSession, dir: String, k: Int = 50): DataFrame =
    ppsSampleOf(
      Tables(s, dir, "documents").select(col("doc_id"), col("n_chars").as("w")), k)

  /** The sampler over any (doc_id, w) frame — public for specs. */
  def ppsSampleOf(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val parts = docs.repartitionByRange(nParts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    val wOffsets = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("pid")).agg(sum(col("w")).as("psum"))
      .withColumn("offset", coalesce(sum(col("psum")).over(wOffsets), lit(0L)))
      .select(col("pid"), col("offset"))
    val step = docs.agg(expr(s"sum(w) div $k").cast(LongType).as("step"))
    parts
      .join(broadcast(offsets), "pid")
      .withColumn("cum", (col("offset") + sum(col("w")).over(wLocal)).cast(LongType))
      .crossJoin(broadcast(step))
      .withColumn("n_picks",
        (expr("cum div step") - expr("(cum - w) div step")).cast(LongType))
      .filter(col("n_picks") > 0)
      .select(col("doc_id"), col("w").cast(LongType).as("w"), col("cum"), col("n_picks"))
      .orderBy(col("doc_id"))
  }

  /** x132: epoch-capped token-budget allocation across sources — the
    * mixture-planning step a data-constrained training run fixes before
    * sampling (the Muennighoff et al. 2023 regime, arXiv:2305.16264:
    * repeating a source beyond ~4 epochs buys almost nothing, so budget
    * past the cap must flow to sources with headroom). Semantics, fully
    * deterministic and integer-exact: budget B = `mult`×total corpus
    * tokens splits uniformly across sources (integer div — the sub-source
    * remainder is deliberately unallocated, both engines agree); each
    * source caps at `maxEpochs`×its unique tokens; the capped surplus
    * redistributes to uncapped sources in ONE pass, proportional to
    * integer headroom (again div — proportional water-filling to a
    * fixpoint would iterate; the single documented pass is deterministic
    * and leaves only div-remainders unspent). The only doubles are the
    * closing epochs ratios. Two scalar aggregates broadcast back over a
    * sources-sized frame — nothing here touches the corpus twice, and
    * the per-source token sums are map-side-combinable. BIGINT products
    * (leftover×headroom) are exact to ~9.2e18; at 1e14-token corpora
    * swap to DECIMAL(38,0) as in x125.
    */
  def tokenBudget(s: SparkSession, dir: String,
      mult: Long = 3L, maxEpochs: Long = 4L): DataFrame = {
    val per = Tables(s, dir, "documents")
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("unique_tokens"))
    val tot = per.agg(count(lit(1)).as("n_src"), sum(col("unique_tokens")).as("u_total"))
    val base = per.crossJoin(broadcast(tot))
      .withColumn("alloc0", expr(s"($mult * u_total) div n_src").cast(LongType))
      .withColumn("cap", lit(maxEpochs) * col("unique_tokens"))
      .withColumn("capped_alloc", least(col("alloc0"), col("cap")))
      .withColumn("headroom", col("cap") - col("capped_alloc"))
    val surplus = base.agg(
      sum(col("alloc0") - col("capped_alloc")).as("leftover"),
      sum(col("headroom")).as("hr_total"))
    base.crossJoin(broadcast(surplus))
      .withColumn("extra_alloc",
        when(col("hr_total") > 0,
          least(col("headroom"),
            expr("(leftover * headroom) div hr_total").cast(LongType)))
          .otherwise(lit(0L)))
      .withColumn("final_alloc", col("capped_alloc") + col("extra_alloc"))
      .select(col("source"), col("n_docs"), col("unique_tokens"), col("alloc0"),
        col("capped_alloc"), col("extra_alloc"), col("final_alloc"),
        (col("final_alloc").cast("double") / col("unique_tokens").cast("double"))
          .as("epochs"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x132_token_budget" -> ((s: SparkSession, dir: String) => tokenBudget(s, dir)),
    "x117_pps_sample" -> ((s: SparkSession, dir: String) => ppsSample(s, dir)),
    "x91_length_batching" -> (lengthBatching _),
    "x76_packed_sequences" -> ((s: SparkSession, dir: String) => packedSequences(s, dir)),
    "x72_global_shuffle" -> ((s: SparkSession, dir: String) => globalShuffle(s, dir)),
    "x73_temperature_mixture" -> (temperatureMixture _),
    "x40_hash_split" -> (hashSplit _),
    "x41_stratified_sample" -> (stratifiedSample _),
    "x46_sequence_packing" -> ((s: SparkSession, dir: String) => sequencePacking(s, dir)),
    "x64_mixture_rebalance" -> ((s: SparkSession, dir: String) => mixtureRebalance(s, dir)))

  private def lengthBatchingOracle: String = {
    val cases = LengthBounds.map(b => s"WHEN n_tokens <= $b THEN $b").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(CASE $cases ELSE $LengthCap END AS BIGINT) AS bucket_len
       |  FROM t)
       |SELECT bucket_len, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(count(*) * bucket_len AS BIGINT) AS n_padded_slots,
       |  CAST(count(*) * bucket_len - sum(n_tokens) AS BIGINT) AS n_pad_waste,
       |  CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) * bucket_len AS DOUBLE) AS pad_efficiency
       |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // x132: the same uniform-split / epoch-cap / one-pass-redistribute
    // integer arithmetic; // is DuckDB's integer division (Spark: div).
    "x132_token_budget" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS unique_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT count(*) AS n_src,
        |        CAST(sum(unique_tokens) AS BIGINT) AS u_total FROM per),
        |base AS (
        |  SELECT source, n_docs, unique_tokens,
        |    CAST((3 * u_total) // n_src AS BIGINT) AS alloc0,
        |    CAST(4 * unique_tokens AS BIGINT) AS cap,
        |    CAST(least((3 * u_total) // n_src, 4 * unique_tokens) AS BIGINT) AS capped_alloc
        |  FROM per CROSS JOIN tot),
        |b2 AS (SELECT *, cap - capped_alloc AS headroom FROM base),
        |agg2 AS (
        |  SELECT CAST(sum(alloc0 - capped_alloc) AS BIGINT) AS leftover,
        |    CAST(sum(headroom) AS BIGINT) AS hr_total FROM b2),
        |fin AS (
        |  SELECT source, n_docs, unique_tokens, alloc0, capped_alloc,
        |    CAST(CASE WHEN hr_total > 0
        |      THEN least(headroom, (leftover * headroom) // hr_total)
        |      ELSE 0 END AS BIGINT) AS extra_alloc
        |  FROM b2 CROSS JOIN agg2)
        |SELECT source, n_docs, unique_tokens, alloc0, capped_alloc, extra_alloc,
        |  capped_alloc + extra_alloc AS final_alloc,
        |  CAST(capped_alloc + extra_alloc AS DOUBLE)
        |    / CAST(unique_tokens AS DOUBLE) AS epochs
        |FROM fin ORDER BY source""".stripMargin,
    // x117: DuckDB's plain global-order window IS the spec; the Spark
    // side must reproduce it exactly through the two-phase scan.
    // Explicit BIGINT casts: DuckDB sum(BIGINT) widens to HUGEINT.
    "x117_pps_sample" ->
      """WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
        |c AS (SELECT doc_id, w,
        |        CAST(sum(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d),
        |t AS (SELECT CAST(sum(w) // 50 AS BIGINT) AS step FROM d)
        |SELECT doc_id, w, cum,
        |  CAST(cum // step - (cum - w) // step AS BIGINT) AS n_picks
        |FROM c, t
        |WHERE cum // step - (cum - w) // step > 0
        |ORDER BY doc_id""".stripMargin,
    "x91_length_batching" -> lengthBatchingOracle,
    "x76_packed_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, split, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b0
        |  FROM t),
        |x AS (
        |  SELECT split, doc_id, n_tokens, b0,
        |    unnest(generate_series(CAST(FLOOR(b0 / 4096) AS BIGINT),
        |                           CAST(FLOOR((b0 + n_tokens - 1) / 4096) AS BIGINT))) AS bin
        |  FROM m),
        |y AS (
        |  SELECT split, bin, doc_id, b0,
        |    greatest(b0, bin * 4096) AS start_tok,
        |    least(b0 + n_tokens, (bin + 1) * 4096) AS end_tok
        |  FROM x)
        |SELECT split, bin, doc_id,
        |  start_tok - bin * 4096 AS offset_in_bin,
        |  end_tok - start_tok AS tokens_taken,
        |  start_tok = b0 AS is_head
        |FROM y ORDER BY split, bin, offset_in_bin, doc_id""".stripMargin,
    "x72_global_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id, md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS digest
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, digest,
        |    ('0x' || substr(digest, 1, 15))::BIGINT % 8 AS shard
        |  FROM d)
        |SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY digest, doc_id) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "x73_temperature_mixture" ->
      """WITH g AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        |w AS (SELECT lang, n_lang,
        |        CAST(floor(sqrt(CAST(n_lang AS DOUBLE)) * 1e6) AS BIGINT) AS wt_q
        |      FROM g),
        |t AS (SELECT CAST(sum(n_lang) AS BIGINT) AS n_total,
        |             CAST(sum(wt_q) AS BIGINT) AS wtq_total FROM w),
        |q AS (SELECT lang, n_lang,
        |        least(n_lang,
        |          CAST(ceil(ceil(CAST(n_total AS DOUBLE) * 0.25)
        |            * (CAST(wt_q AS DOUBLE) / CAST(wtq_total AS DOUBLE))) AS BIGINT)) AS target
        |      FROM w, t),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000,
        |                   doc_id) AS rnk
        |      FROM documents)
        |SELECT r.doc_id, r.lang, q.n_lang, q.target, r.rnk <= q.target AS keep
        |FROM r JOIN q USING (lang) ORDER BY doc_id""".stripMargin,
    "x40_hash_split" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x41_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE CASE WHEN lang = 'en' THEN bucket < 50 ELSE bucket < 20 END
        |ORDER BY doc_id""".stripMargin,
    "x46_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, split, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM t)
        |SELECT split, CAST(FLOOR(tokens_before / 4096) AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM m GROUP BY 1, 2 ORDER BY split, bin""".stripMargin,
    "x64_mixture_rebalance" ->
      """WITH g AS (SELECT lang, source, count(*) AS n_group FROM documents GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_group) AS BIGINT) AS n_total, count(*) AS n_groups FROM g),
        |q AS (SELECT lang, source,
        |        least(n_group,
        |          CAST(ceil(CAST(n_total AS DOUBLE) * 0.6 / CAST(n_groups AS DOUBLE)) AS BIGINT)) AS quota
        |      FROM g, t),
        |r AS (SELECT doc_id, lang, source,
        |        row_number() OVER (PARTITION BY lang, source
        |          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000,
        |                   doc_id) AS rnk
        |      FROM documents)
        |SELECT r.doc_id, r.lang, r.source, q.quota, r.rnk, r.rnk <= q.quota AS keep
        |FROM r JOIN q USING (lang, source) ORDER BY doc_id""".stripMargin)
}
