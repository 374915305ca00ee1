package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Sketch/approximate aggregates — the cardinality and quantile shapes
  * that replace exact (shuffle-heavy) computation at 100 TB:
  *
  *   - `approx_count_distinct` (HyperLogLog++): mergeable fixed-size
  *     sketch, map-side combinable, constant memory per group — the only
  *     sane distinct-count at corpus scale (exact distinct shuffles every
  *     value once);
  *   - `percentile_approx` (KLL-style): mergeable quantile sketch;
  *   - exact `percentile` kept alongside as the correctness anchor.
  *
  * The approximate results are Spark-implementation-specific, so the
  * driver records rows-only; SketchesSpec bounds their error against the
  * exact answers (HLL++ with default rsd=0.05 — and the fixed hash makes
  * the measurement deterministic).
  */
object Sketches {

  /** Exact vs approximate distinct users and value percentiles per
    * event_type.
    */
  def eventSketches(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile(value, 0.9)").as("p90_exact"),
        expr("percentile_approx(value, 0.5, 10000)").as("p50_approx"))
      .orderBy(col("event_type"))

  /** Heavy hitters via count-min sketch: one fixed-size mergeable sketch
    * over the exploded token stream (map-side combinable — the sketch,
    * not the tokens, rides the shuffle), then point estimates for the
    * exact top-k tokens next to their true counts. At 100 TB the exact
    * leg disappears and the CMS answers "how often does X occur" from
    * kilobytes of state; here the exact counts are the spec's reference.
    */
  def tokenHeavyHitters(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val bytes = toks
      .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exactTop = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token"))
      .limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    exactTop.toSeq
      .map { case (t, n) => (t, n, cms.estimateCount(t)) }
      .toDF("token", "n_exact", "n_est")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_sketches" -> (eventSketches _),
    "q41_heavy_hitters" -> ((s: SparkSession, dir: String) => tokenHeavyHitters(s, dir)))

  /** No oracle — HLL++/KLL/CMS sketches are engine-specific. SketchesSpec
    * asserts the error bounds against the exact columns.
    */
  val oracles: Map[String, String] = Map.empty
}
