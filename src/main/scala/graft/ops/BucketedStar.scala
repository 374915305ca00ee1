package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.engine.{Bucketing, Tables}

/** The star join (q05) over BUCKETED fact tables: lineitem and orders are
  * written once bucketed + sorted by their order key, so the fact-fact
  * leg — the only shuffle in q05's plan — joins matching buckets directly
  * with NO Exchange on either side. This is the §7 "pre-partition the
  * warehouse" play: the one-time bucketed write amortizes across every
  * downstream join/agg on the key, which at 100 TB is the difference
  * between shuffling the warehouse nightly and streaming matched files.
  *
  * Same output as q05 (the driver grades it against the identical
  * oracle); BucketingSpec asserts the no-Exchange plan property on the
  * fact leg.
  */
object BucketedStar {

  private val M = DecimalType(18, 6)

  /** Session-catalog name for the bucketed copy — keyed by a data-dir
    * digest so warm (sf0.001) and timed (sf0.1) runs keep separate
    * tables (literal-digest naming, not String.hashCode: 32-bit
    * hashCode collisions between two dirs would silently share a
    * table).
    */
  def bucketedTable(dir: String, name: String): String =
    s"graft_b_${name}_d" + graft.engine.Bucketing.pathDigest(dir)

  /** Idempotently materialize the bucketed fact copies for `dir`.
    * `Bench` calls this OUTSIDE the timed window (the write is the
    * amortized one-time cost, not per-query cost); the query calls it
    * too so it stands alone under `Verify`.
    */
  def ensure(s: SparkSession, dir: String, numBuckets: Int = 32): Unit =
    Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey").foreach {
      case (t, k) =>
        val tbl = bucketedTable(dir, t)
        if (!s.catalog.tableExists(tbl))
          Bucketing.writeBucketed(Tables(s, dir, t), tbl, k, numBuckets)
    }

  /** q05's plan with the fact-fact Exchange removed by bucketing. */
  def joinStarBucketed(s: SparkSession, dir: String): DataFrame = {
    ensure(s, dir)
    val li = s.table(bucketedTable(dir, "lineitem"))
    val o = s.table(bucketedTable(dir, "orders"))
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    def dec(c: org.apache.spark.sql.Column) = c.cast(M)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast(M))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_join_star_bucketed" -> (joinStarBucketed _))

  /** Identical result contract to q05 — the oracle is shared verbatim. */
  val oracles: Map[String, String] = Map(
    "q37_join_star_bucketed" -> Relational.oracles("q05_join_star"))
}
