package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.engine.Tables
import graft.engine.Pin.PinOps

/** Data-governance audits over the `customer` dimension: k-anonymity /
  * l-diversity (Sweeney 2002; Machanavajjhala et al. 2006) and a
  * fixed-lattice generalization pass — the checks a warehouse runs
  * before publishing a dimension extract. The reference pipeline
  * publishes its dims unaudited (`dags/flights_data_pipeline.py`
  * loads dim_passenger verbatim); these are the standard release
  * gates.
  *
  * Quasi-identifier (QI) = (c_nationkey, account-balance band);
  * sensitive attribute = c_mktsegment. All banding is integer
  * floor-division on floor-cents, so both engines agree exactly.
  *
  * Scale shape: every audit is one hash aggregate over the QI keys
  * (map-side combinable counts and distincts) — linear, one shuffle
  * per lattice level, no joins wider than the dimension itself.
  */
object Privacy {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def cust(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
      col("c_mktsegment"),
      floor(col("c_acctbal") * lit(100.0)).cast(LongType).as("cents"))

  /** band = floor(cents / width) — exact on BIGINTs ≥ 0 and matching
    * DuckDB's `//` for the negative balances too (floor semantics on
    * both sides).
    */
  private def band(cents: org.apache.spark.sql.Column, width: Long) =
    floor(cents.cast("double") / lit(width.toDouble)).cast(LongType)

  /** x196: the k-anonymity / l-diversity audit at the publishing
    * grain — per QI group (nation, $1000 balance band): row count,
    * distinct sensitive values, and the two release-gate verdicts
    * (k = 5, l = 3). A group failing either is what a release process
    * must generalize or suppress.
    */
  def kAnonymityAudit(s: SparkSession, dir: String, k: Int = 5,
      l: Int = 3): DataFrame =
    cust(s, dir)
      .groupBy(col("c_nationkey"), band(col("cents"), 100000L).as("bal_band"))
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col("c_mktsegment")).as("distinct_seg"))
      .select(col("c_nationkey"), col("bal_band"), col("group_n"),
        col("distinct_seg"),
        (col("group_n") >= k).as("k_anonymous"),
        (col("distinct_seg") >= l).as("l_diverse"))
      .orderBy(col("c_nationkey"), col("bal_band"))

  /** x197: minimal safe generalization per row over a fixed 3-level
    * lattice — L0 (nation, $1000 band), L1 (nation, $5000 band),
    * L2 (region via the nation dim, $25000 band). For every customer:
    * its group size at each level and the smallest level whose group
    * reaches k = 5 (99 = unsafe even fully generalized). The
    * fixed-lattice form of Mondrian-style generalization: each level
    * is one aggregate + one key join back, no recursion.
    */
  def generalizationLevels(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val base = cust(s, dir)
      .join(t(s, dir, "nation").select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey")), Seq("c_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_regionkey"),
        band(col("cents"), 100000L).as("b0"),
        band(col("cents"), 500000L).as("b1"),
        band(col("cents"), 2500000L).as("b2"))
      .pinned
    def sizes(keys: Seq[String], out: String): DataFrame =
      base.groupBy(keys.map(col): _*).agg(count(lit(1)).as(out))
    base
      .join(sizes(Seq("c_nationkey", "b0"), "n0"), Seq("c_nationkey", "b0"))
      .join(sizes(Seq("c_nationkey", "b1"), "n1"), Seq("c_nationkey", "b1"))
      .join(sizes(Seq("n_regionkey", "b2"), "n2"), Seq("n_regionkey", "b2"))
      .select(col("c_custkey"), col("n0"), col("n1"), col("n2"),
        when(col("n0") >= k, 0).when(col("n1") >= k, 1)
          .when(col("n2") >= k, 2).otherwise(99).cast(IntegerType)
          .as("safe_level"))
      .orderBy(col("c_custkey"))
  }

  /** x200: the adaptive masked extract — the PUBLISH step the x196/x197
    * audits exist for. Every row is released at ITS OWN minimal safe
    * generalization (the x197 lattice level): key → deterministic md5
    * pseudonym (joinable across extracts, irreversible without the
    * salt table — standard tokenization), name dropped, geography and
    * balance generalized per level (L0 nation+$1000 band, L1
    * nation+$5000, L2 region+$25000, never-safe rows fully
    * suppressed), segment carried as the payload. One frame: the
    * privacy-audited publishable view.
    *
    * Shape: the x197 aggregates + key joins, then a pure projection —
    * nothing wider than the dimension.
    */
  def maskedExtract(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val base = cust(s, dir)
      .join(t(s, dir, "nation").select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey")), Seq("c_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_regionkey"),
        col("c_mktsegment"),
        band(col("cents"), 100000L).as("b0"),
        band(col("cents"), 500000L).as("b1"),
        band(col("cents"), 2500000L).as("b2"))
      .pinned
    def sizes(keys: Seq[String], out: String): DataFrame =
      base.groupBy(keys.map(col): _*).agg(count(lit(1)).as(out))
    base
      .join(sizes(Seq("c_nationkey", "b0"), "n0"), Seq("c_nationkey", "b0"))
      .join(sizes(Seq("c_nationkey", "b1"), "n1"), Seq("c_nationkey", "b1"))
      .join(sizes(Seq("n_regionkey", "b2"), "n2"), Seq("n_regionkey", "b2"))
      .withColumn("lvl",
        when(col("n0") >= k, 0).when(col("n1") >= k, 1)
          .when(col("n2") >= k, 2).otherwise(99))
      .select(
        graft.ext.TextAnalysis.tokenHash(
          concat(lit("pseud:"), col("c_custkey").cast("string"))).as("pseudonym"),
        col("lvl").cast(IntegerType).as("level"),
        when(col("lvl") <= 1, concat(lit("NATION:"), col("c_nationkey").cast("string")))
          .when(col("lvl") === 2, concat(lit("REGION:"), col("n_regionkey").cast("string")))
          .otherwise(lit("SUPPRESSED")).as("geo"),
        when(col("lvl") === 0, col("b0")).when(col("lvl") === 1, col("b1"))
          .when(col("lvl") === 2, col("b2")).otherwise(lit(null)).cast(LongType)
          .as("bal_band"),
        when(col("lvl") === 0, 1000L).when(col("lvl") === 1, 5000L)
          .when(col("lvl") === 2, 25000L).otherwise(lit(null)).cast(LongType)
          .as("band_width_usd"),
        col("c_mktsegment").as("segment"))
      .orderBy(col("pseudonym"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x196_k_anonymity" -> ((s: SparkSession, dir: String) => kAnonymityAudit(s, dir)),
    "x197_generalization" -> ((s: SparkSession, dir: String) => generalizationLevels(s, dir)),
    "x200_masked_extract" -> ((s: SparkSession, dir: String) => maskedExtract(s, dir)))

  private val kAnonOracle: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey, c_mktsegment,
      |    CAST(floor(CAST(floor(c_acctbal * 100.0) AS BIGINT) / 100000.0)
      |      AS BIGINT) AS bal_band
      |  FROM customer)
      |SELECT c_nationkey, bal_band,
      |  CAST(count(*) AS BIGINT) AS group_n,
      |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS distinct_seg,
      |  count(*) >= 5 AS k_anonymous,
      |  count(DISTINCT c_mktsegment) >= 3 AS l_diverse
      |FROM c GROUP BY c_nationkey, bal_band
      |ORDER BY c_nationkey, bal_band""".stripMargin

  private val genOracle: String =
    """WITH base AS MATERIALIZED (
      |  SELECT c_custkey, c_nationkey, n_regionkey,
      |    CAST(floor(cents / 100000.0) AS BIGINT) AS b0,
      |    CAST(floor(cents / 500000.0) AS BIGINT) AS b1,
      |    CAST(floor(cents / 2500000.0) AS BIGINT) AS b2
      |  FROM (SELECT c_custkey, c_nationkey,
      |          CAST(floor(c_acctbal * 100.0) AS BIGINT) AS cents
      |        FROM customer) c
      |  JOIN nation ON n_nationkey = c_nationkey),
      |s0 AS (SELECT c_nationkey, b0, CAST(count(*) AS BIGINT) AS n0
      |       FROM base GROUP BY c_nationkey, b0),
      |s1 AS (SELECT c_nationkey, b1, CAST(count(*) AS BIGINT) AS n1
      |       FROM base GROUP BY c_nationkey, b1),
      |s2 AS (SELECT n_regionkey, b2, CAST(count(*) AS BIGINT) AS n2
      |       FROM base GROUP BY n_regionkey, b2)
      |SELECT b.c_custkey, s0.n0, s1.n1, s2.n2,
      |  CAST(CASE WHEN s0.n0 >= 5 THEN 0 WHEN s1.n1 >= 5 THEN 1
      |       WHEN s2.n2 >= 5 THEN 2 ELSE 99 END AS INT) AS safe_level
      |FROM base b
      |JOIN s0 ON s0.c_nationkey = b.c_nationkey AND s0.b0 = b.b0
      |JOIN s1 ON s1.c_nationkey = b.c_nationkey AND s1.b1 = b.b1
      |JOIN s2 ON s2.n_regionkey = b.n_regionkey AND s2.b2 = b.b2
      |ORDER BY b.c_custkey""".stripMargin

  private val maskedOracle: String =
    """WITH base AS MATERIALIZED (
      |  SELECT c_custkey, c_nationkey, n_regionkey, c_mktsegment,
      |    CAST(floor(cents / 100000.0) AS BIGINT) AS b0,
      |    CAST(floor(cents / 500000.0) AS BIGINT) AS b1,
      |    CAST(floor(cents / 2500000.0) AS BIGINT) AS b2
      |  FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
      |          CAST(floor(c_acctbal * 100.0) AS BIGINT) AS cents
      |        FROM customer) c
      |  JOIN nation ON n_nationkey = c_nationkey),
      |s0 AS (SELECT c_nationkey, b0, count(*) AS n0 FROM base GROUP BY 1, 2),
      |s1 AS (SELECT c_nationkey, b1, count(*) AS n1 FROM base GROUP BY 1, 2),
      |s2 AS (SELECT n_regionkey, b2, count(*) AS n2 FROM base GROUP BY 1, 2),
      |lv AS (
      |  SELECT b.*, CASE WHEN s0.n0 >= 5 THEN 0 WHEN s1.n1 >= 5 THEN 1
      |              WHEN s2.n2 >= 5 THEN 2 ELSE 99 END AS lvl
      |  FROM base b
      |  JOIN s0 ON s0.c_nationkey = b.c_nationkey AND s0.b0 = b.b0
      |  JOIN s1 ON s1.c_nationkey = b.c_nationkey AND s1.b1 = b.b1
      |  JOIN s2 ON s2.n_regionkey = b.n_regionkey AND s2.b2 = b.b2)
      |SELECT
      |  ('0x' || substr(md5('pseud:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
      |    AS pseudonym,
      |  CAST(lvl AS INT) AS level,
      |  CASE WHEN lvl <= 1 THEN 'NATION:' || CAST(c_nationkey AS VARCHAR)
      |       WHEN lvl = 2 THEN 'REGION:' || CAST(n_regionkey AS VARCHAR)
      |       ELSE 'SUPPRESSED' END AS geo,
      |  CAST(CASE WHEN lvl = 0 THEN b0 WHEN lvl = 1 THEN b1
      |       WHEN lvl = 2 THEN b2 END AS BIGINT) AS bal_band,
      |  CAST(CASE WHEN lvl = 0 THEN 1000 WHEN lvl = 1 THEN 5000
      |       WHEN lvl = 2 THEN 25000 END AS BIGINT) AS band_width_usd,
      |  c_mktsegment AS segment
      |FROM lv ORDER BY pseudonym""".stripMargin

  val oracles: Map[String, String] = Map(
    "x196_k_anonymity" -> kAnonOracle,
    "x197_generalization" -> genOracle,
    "x200_masked_extract" -> maskedOracle)
}
