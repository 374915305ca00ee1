package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Tables

/** Multi-dimensional data clustering via a Z-order (Morton) key — the
  * data-SKIPPING side of the 100 TB story, complementing partition
  * pruning (day partitions) and bucketing (join co-location): a table
  * laid out in Z-key order packs rows that are close in EVERY clustered
  * dimension into the same parquet row groups, so min/max row-group
  * statistics prune scans for predicates on ANY of those dimensions. A
  * single-column sort only ever prunes its leading column; at 100 TB the
  * difference is reading 2% of row groups instead of 100% for the
  * second-dimension query.
  *
  * The key is pure bit arithmetic (codegen'd, shuffle-free); the layout
  * write is one range-repartition + in-partition sort — the standard
  * OPTIMIZE/ZORDER maintenance job, amortized across every later scan.
  * ZOrderSpec proves the skipping effect on real parquet footers:
  * row groups whose [min,max] overlap a second-dimension predicate are
  * strictly fewer under the Z layout than under a linear sort.
  */
object ZOrder {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit b of x lands at position 2b, bit b of y at 2b+1. Identical bit
    * arithmetic runs in the DuckDB twin.
    */
  def interleaveBits(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale `c` from [lo, hi] onto the `bits`-bit code range — the range
    * normalization a Z layout needs so BOTH dimensions contribute
    * equally to the key's high bits. Interleaving raw values with
    * unequal magnitudes (11-bit part keys vs 7-bit supplier keys) puts
    * the wide column's surplus bits above every bit of the narrow one,
    * degenerating to a plain sort on the wide column.
    */
  def rangeCode(c: Column, lo: Long, hi: Long, bits: Int): Column =
    floor(((c - lit(lo)) * lit(1L << bits)) / lit(hi - lo + 1)).cast(LongType)

  /** Rewrite `df` clustered by the Z-key of two dimension columns:
    * normalize each to `normBits`-bit range codes (one bounded min/max
    * aggregate — two longs to the driver), interleave, range-repartition
    * so each output file owns a contiguous Z range, and sort within
    * partitions so row groups inside a file are Z-contiguous too.
    * `rowGroupBytes` is exposed for tests; production leaves the 128 MB
    * default.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int = 1, rowGroupBytes: Long = 128L * 1024 * 1024,
      normBits: Int = 8): Unit = {
    val r = df.agg(
      min(col(xCol)).cast(LongType), max(col(xCol)).cast(LongType),
      min(col(yCol)).cast(LongType), max(col(yCol)).cast(LongType)).head()
    val zkey = interleaveBits(
      rangeCode(col(xCol), r.getLong(0), r.getLong(1), normBits),
      rangeCode(col(yCol), r.getLong(2), r.getLong(3), normBits),
      bits = normBits)
    df.withColumn("_zkey", zkey)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
  }

  /** Graded query: the Z-key computation itself over a second-dimension
    * slice of lineitem (the predicate shape Z-ordering exists to serve).
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_suppkey").between(20, 29))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        interleaveBits(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_zorder_key" -> (zorderKey _))

  val oracles: Map[String, String] = Map(
    "q48_zorder_key" -> {
      val terms = (0 until 16).flatMap { b =>
        Seq(s"(((l_partkey >> $b) & 1) << ${2 * b})",
          s"(((l_suppkey >> $b) & 1) << ${2 * b + 1})")
      }.mkString(" | ")
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  l_partkey, l_suppkey,
         |  CAST($terms AS BIGINT) AS zkey
         |FROM lineitem
         |WHERE l_suppkey BETWEEN 20 AND 29
         |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin
    })
}
