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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_sketches" -> (eventSketches _))

  /** No oracle — HLL++/KLL sketches are engine-specific. SketchesSpec
    * asserts the error bounds against the exact columns.
    */
  val oracles: Map[String, String] = Map.empty
}
