package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.engine.Tables

/** Bloom-pruned semi join — the explicit form of the runtime row-level
  * filter Spark injects for selective joins, built on the SAME Catalyst
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, which
  * Spark does not expose as SQL functions): aggregate the dim side's
  * join keys into a bloom filter, ship the sketch as a LITERAL into a
  * fact-side pre-filter, then run the exact semi join over the pruned
  * remainder.
  *
  * Why it matters at 100 TB: the semi join still shuffles every fact row
  * whose key MIGHT match; with a selective dim, the bloom pre-filter
  * eliminates the overwhelming majority of fact rows BEFORE the
  * exchange, inside the scan's codegen stage. False positives only cost
  * wasted shuffle rows — the exact join removes them — so the operator's
  * OUTPUT is exactly the plain semi join, which is what lets the DuckDB
  * twin hash-gate a sketch-accelerated plan.
  *
  * The collected sketch is kilobytes (bounded by `numBits`, like the
  * broadcast the alternative plan would ship) — a k-bounded driver
  * collect, not a data-dependent one.
  */
object BloomJoin {

  /** Aggregate `c`'s xxhash64 into a bloom filter (binary sketch). */
  def bloomAgg(c: Column, estimatedItems: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)), estimatedItems).toAggregateExpression())

  /** Membership probe against a collected sketch, as a foldable literal
    * (BloomFilterMightContain requires a constant bloom side).
    */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloomBytes),
      ColumnBridge.expression(xxhash64(c))))

  /** Build the dim-side sketch. Exposed for the spec. */
  private[ops] def buildBloom(dim: DataFrame, key: String,
      estimatedItems: Long): Array[Byte] =
    dim.agg(bloomAgg(col(key), estimatedItems).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

  /** Events of users in one market segment, via bloom pre-filter + exact
    * semi join; output equals the un-pruned semi join row-for-row.
    */
  def bloomSemiReduction(s: SparkSession, dir: String,
      segment: String = "BUILDING"): DataFrame = {
    val dim = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey").as("user_id"))
    val sketch = buildBloom(dim, "user_id", 100000L)
    Tables(s, dir, "events")
      .filter(mightContain(sketch, col("user_id")))
      .join(dim, Seq("user_id"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** x156: Bloom contamination pre-screen — the at-scale shape of the
    * x44/x96 eval-integrity checks: the (small) eval split's canonical
    * fingerprints aggregate into one bloom sketch that ships to every
    * train partition as a codegen'd literal probe; only rows the
    * sketch flags ever reach the exact fingerprint join. At 100 TB the
    * exact IN-list is a shuffle over the whole training corpus — the
    * bloom probe turns it into a scan-local filter with a tiny exact
    * join over the flagged remainder. The graded row reports the EXACT
    * legs (train size, eval fingerprint count, true contamination) and
    * pins the two sketch guarantees the plan relies on: a bloom filter
    * has NO false negatives (every truly contaminated row is flagged —
    * otherwise the pruned exact join would be wrong, not just slow),
    * and its false-positive mass stays under a generous bound (10% of
    * the clean rows at these sketch parameters ≥3σ; a broken hash
    * flips the flag and fails the hash gate). Flag values are
    * deterministic: Spark's bloom uses fixed seeds.
    */
  def bloomContamination(s: SparkSession, dir: String): DataFrame = {
    val fps = Tables(s, dir, "documents")
      .select(col("doc_id"), graft.ext.TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .join(graft.ops.Sampling.hashSplit(s, dir).select(col("doc_id"), col("split")),
        "doc_id")
    val eval = fps.filter(col("split") === "test").select(col("fp"))
    val train = fps.filter(col("split") =!= "test")
    val sketch = buildBloom(eval, "fp", 10000L)
    val evalFps = eval.distinct().withColumn("contam", lit(true))
    train
      .withColumn("bloom_hit", mightContain(sketch, col("fp")))
      .join(evalFps, Seq("fp"), "left")
      .withColumn("is_contaminated", coalesce(col("contam"), lit(false)))
      .agg(
        count(lit(1)).as("n_train"),
        sum(when(col("is_contaminated"), 1L).otherwise(0L)).as("n_contaminated"),
        (sum(when(col("is_contaminated") && !col("bloom_hit"), 1L).otherwise(0L)) === 0L)
          .as("no_false_negatives"),
        (sum(when(!col("is_contaminated") && col("bloom_hit"), 1L).otherwise(0L)) <=
          ceil(sum(when(!col("is_contaminated"), 1L).otherwise(0L)) * lit(0.10)))
          .as("fp_bound_ok"))
      .crossJoin(eval.distinct().agg(count(lit(1)).as("n_eval_fps")))
      .select(col("n_train"), col("n_eval_fps"), col("n_contaminated"),
        col("no_false_negatives"), col("fp_bound_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_bloom_semi_reduction" -> ((s: SparkSession, dir: String) =>
      bloomSemiReduction(s, dir)),
    "x156_bloom_contamination" -> (bloomContamination _))

  val oracles: Map[String, String] = Map(
    "q68_bloom_semi_reduction" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE user_id IN (SELECT c_custkey FROM customer
        |                  WHERE c_mktsegment = 'BUILDING')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // x156: exact legs relationally (x40's md5 split, x04's canonical
    // fingerprint); the two sketch guarantees are pinned TRUE.
    "x156_bloom_contamination" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |  FROM documents),
        |t AS (SELECT f.fp FROM fps f JOIN sp USING (doc_id) WHERE sp.split <> 'test'),
        |e AS (SELECT DISTINCT f.fp FROM fps f JOIN sp USING (doc_id) WHERE sp.split = 'test')
        |SELECT CAST((SELECT count(*) FROM t) AS BIGINT) AS n_train,
        |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_eval_fps,
        |  CAST((SELECT count(*) FROM t WHERE fp IN (SELECT fp FROM e)) AS BIGINT)
        |    AS n_contaminated,
        |  TRUE AS no_false_negatives, TRUE AS fp_bound_ok""".stripMargin)
}
