package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.Tables

/** Graph analytics beyond connected components (x47/x57): PageRank over
  * the part co-purchase graph — "which products sit at the center of
  * the basket network". Nodes are parts, undirected edges connect parts
  * co-ordered in at least `minSupport` orders (the q72 pair machinery).
  *
  * The rank arithmetic is FIXED-POINT INTEGER (ranks scaled by 1e9,
  * damping 0.85 as *85 then integer-divide 100, contributions as
  * rank DIV degree): floating-point PageRank sums contributions in
  * partition order and can never hash-gate, while integer sums are
  * exact in any order — so after the fixed 5 iterations both engines
  * hold bit-identical ranks, and the oracle simply unrolls the same 5
  * steps as chained CTEs. Truncation loss is identical on both sides by
  * construction.
  *
  * Scale shape: each iteration is one join onto the edge list plus one
  * aggregation keyed by destination — the textbook distributed PageRank
  * step; the undirected co-order graph has no dangling nodes, so no
  * global mass-redistribution term is needed. At 100 TB the edge list
  * is the big table and each step shuffles (dst, contrib) pairs only.
  */
object Graph {

  private val Scale = 1000000000L

  /** Part co-order PageRank: `iters` fixed iterations at damping 0.85. */
  def partPagerank(s: SparkSession, dir: String,
      iters: Int = 5, minSupport: Long = 2L): DataFrame = {
    val items = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = items.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val pairs = a.join(b, "l_orderkey")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
      .select(col("pa"), col("pb"))
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("degree")).persist()
    var pr = deg.select(col("src").as("part"), lit(Scale).as("rank_q"))
    (1 to iters).foreach { _ =>
      val contribs = pr
        .join(deg, pr("part") === deg("src"))
        .select(col("part"), expr("rank_q DIV degree").as("c"))
        .join(edges, col("part") === col("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      pr = deg.select(col("src").as("part"))
        .join(contribs.select(col("dst").as("part"), col("contrib")), Seq("part"), "left")
        .select(col("part"),
          (lit(15L * Scale / 100L) +
            expr("(85 * coalesce(contrib, 0)) DIV 100")).as("rank_q"))
    }
    val out = pr
      .join(deg.select(col("src").as("part"), col("degree")), "part")
      .select(col("part").as("l_partkey"), col("degree"), col("rank_q"),
        (col("rank_q").cast(DoubleType) / 1e9).as("rank"))
      .orderBy(col("l_partkey"))
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x82_part_pagerank" -> ((s: SparkSession, dir: String) => partPagerank(s, dir)))

  /** The identical 5 fixed-point iterations unrolled as chained CTEs —
    * aggregation inside a recursive CTE member is not portable SQL, and
    * unrolling makes the oracle a pure function of the same integers.
    */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      val prev = s"pr${i - 1}"
      s"""pr$i AS (
         |  SELECT d.src AS part,
         |    150000000 + (85 * COALESCE(c.contrib, 0)) // 100 AS rank_q
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst, CAST(sum(p.rank_q // dg.degree) AS BIGINT) AS contrib
         |    FROM $prev p
         |    JOIN deg dg ON dg.src = p.part
         |    JOIN edges e ON e.src = p.part
         |    GROUP BY e.dst) c ON c.dst = d.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |edges AS (SELECT pa AS src, pb AS dst FROM pairs
       |          UNION ALL SELECT pb, pa FROM pairs),
       |deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1),
       |pr0 AS (SELECT src AS part, CAST(1000000000 AS BIGINT) AS rank_q FROM deg),
       |$steps
       |SELECT p.part AS l_partkey, d.degree, p.rank_q,
       |  CAST(p.rank_q AS DOUBLE) / 1e9 AS rank
       |FROM pr$iters p JOIN deg d ON d.src = p.part
       |ORDER BY l_partkey""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "x82_part_pagerank" -> pagerankOracle(5))
}
