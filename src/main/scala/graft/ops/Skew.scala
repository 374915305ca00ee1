package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Skew mitigation (SURVEY.md "hard parts" #5): two-phase salted
  * aggregation. A hot group key (one event_type carrying half the
  * corpus) turns a plain groupBy into a single straggler task; salting
  * fans each key across `nSalts` partial groups, aggregates partials in
  * parallel, then combines per key — the shuffle carries nSalts rows per
  * key instead of every raw row into one partition.
  *
  * The result is bit-identical to the unsalted aggregate for
  * decomposable aggregates (count/min/max here), which is exactly what
  * the DuckDB oracle asserts. Exact distinct-count is handled by its own
  * two-phase shape: dedup on (key, value) first — itself salt-free
  * because the dedup key is high-cardinality — then count per key.
  */
object Skew {

  /** Per-key count/min/max via explicit salt fan-out, plus exact distinct
    * users via the dedup-then-count phase.
    */
  def saltedEventStats(s: SparkSession, dir: String, nSalts: Int = 16): DataFrame = {
    val ev = Tables(s, dir, "events")
    val salted = ev
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(nSalts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(
        count(lit(1)).as("pc"),
        min(col("value")).as("pmin"),
        max(col("value")).as("pmax"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("pc")).as("n_events"),
        min(col("pmin")).as("min_value"),
        max(col("pmax")).as("max_value"))
    val distinctUsers = ev
      .select(col("event_type"), col("user_id")).dropDuplicates()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    salted.join(distinctUsers, "event_type")
      .select(col("event_type"), col("n_events"), col("min_value"),
        col("max_value"), col("n_users"))
      .orderBy(col("event_type"))
  }

  /** Salted skew JOIN: the fact side appends a deterministic salt to the
    * join key; the (too-big-to-broadcast, hot-keyed) build side replicates
    * once per salt; the join runs on (key, salt). A hot key's rows spread
    * over `nSalts` tasks instead of one straggler partition, at the cost
    * of `nSalts`x replication of the build side only. Every fact row
    * still matches exactly one replica (its own salt), so the result is
    * row-identical to the plain join — which is what the oracle asserts.
    * (AQE's skew-join split handles sort-merge stragglers adaptively;
    * explicit salting is the plan-stable spelling that also covers
    * aggregate-followed joins AQE cannot split.)
    */
  def saltedEnrichJoin(s: SparkSession, dir: String, nSalts: Int = 16): DataFrame = {
    val ev = Tables(s, dir, "events")
    val dim = ev.groupBy(col("user_id")).agg(
      count(lit(1)).as("user_n_events"),
      max(col("value")).as("user_max_value"))
    val fact = ev.select(col("event_id"), col("user_id"), col("value"))
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(nSalts)))
    val dimReplicated = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    fact.join(dimReplicated, Seq("user_id", "salt"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("user_n_events"), col("user_max_value"))
      .orderBy(col("event_id"))
  }

  /** Key-distribution skew diagnosis — the report that decides WHETHER
    * the salted plans above are needed: the k hottest join/agg keys with
    * their row share and hot ratio (key rows ÷ mean rows per key; the
    * AQE skew-join trigger is exactly this statistic at partition
    * grain). One hash-aggregate to key grain, a TakeOrdered top-k (never
    * a full sort), and a 1-row broadcast of the totals; deterministic
    * under ties via the key tiebreaker in both the selection and the
    * presentation order.
    */
  def skewReport(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val counts = Tables(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).cast("long").as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("n_rows").desc, col("user_id")).limit(k)
      .crossJoin(broadcast(totals))
      .select(col("user_id"), col("n_rows"),
        (col("n_rows").cast("double") / col("total_rows").cast("double"))
          .as("row_share"),
        (col("n_rows").cast("double") * col("n_keys").cast("double")
          / col("total_rows").cast("double")).as("hot_ratio"))
      .orderBy(col("n_rows").desc, col("user_id"))
  }

  /** Deterministic skewed corpus for join experiments: `nRows` fact rows
    * over `nKeys` keys with `hotShare` of ALL rows on key 0 — the
    * one-customer-dominates shape that turns a shuffle join's key-0
    * partition into the straggler. Pure `spark.range` arithmetic: no
    * RNG, no driver rows, any size.
    */
  def skewedFact(s: SparkSession, nRows: Long, nKeys: Long,
      hotShare: Double = 0.5): DataFrame = {
    val hotEvery = math.max(2L, math.round(1.0 / hotShare))
    s.range(nRows)
      .select(col("id"),
        when(col("id") % hotEvery === 0, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("key"),
        (col("id") % 1000).cast("double").as("v"))
  }

  def skewedDim(s: SparkSession, nKeys: Long): DataFrame =
    s.range(nKeys).select(col("id").as("key"),
      (col("id") % 97).cast("double").as("dim_v"))

  /** The three competing spellings of the same skewed enrich join —
    * SkewSpec races them and asserts equal results; BASELINE.md records
    * the walls:
    *   - `plainJoin`: the straggler baseline (and what AQE rewrites);
    *   - `saltedJoin`: explicit fan-out — plan-stable, works even where
    *     AQE cannot split (e.g. when the join output's partitioning is
    *     REQUIRED by a downstream stateful op);
    *   - AQE skew-join: run `plainJoin` under
    *     `spark.sql.adaptive.skewJoin.enabled` with the skew thresholds
    *     sized to the data — Spark splits the oversized partition into
    *     per-split tasks and replicates the matching build side, no code
    *     change. The at-scale default; salting remains the escape hatch.
    */
  def plainJoin(fact: DataFrame, dim: DataFrame): DataFrame =
    fact.join(dim, "key")
      .select(col("id"), col("key"), col("v"), col("dim_v"))

  def saltedJoin(fact: DataFrame, dim: DataFrame, nSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("salt", pmod(xxhash64(col("id")), lit(nSalts)))
    val dimReplicated = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedFact.join(dimReplicated, Seq("key", "salt"))
      .select(col("id"), col("key"), col("v"), col("dim_v"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_salted_agg" -> ((s: SparkSession, dir: String) => saltedEventStats(s, dir)),
    "q40_salted_join" -> ((s: SparkSession, dir: String) => saltedEnrichJoin(s, dir)),
    "q79_skew_report" -> ((s: SparkSession, dir: String) => skewReport(s, dir)))

  /** The oracles are the PLAIN aggregate / join — proving the salted
    * plans compute the same answers.
    */
  val oracles: Map[String, String] = Map(
    "q79_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
        |             count(*) AS n_keys FROM c),
        |top AS (SELECT * FROM c ORDER BY n_rows DESC, user_id LIMIT 20)
        |SELECT user_id, n_rows,
        |  CAST(n_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) AS row_share,
        |  CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(total_rows AS DOUBLE) AS hot_ratio
        |FROM top, t ORDER BY n_rows DESC, user_id""".stripMargin,
    "q28_salted_agg" ->
      """SELECT event_type, count(*) AS n_events, min(value) AS min_value,
        |  max(value) AS max_value, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q40_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, count(*) AS user_n_events, max(value) AS user_max_value
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.value, d.user_n_events, d.user_max_value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY e.event_id""".stripMargin)
}
