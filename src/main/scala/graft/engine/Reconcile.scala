package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Anti-entropy reconciliation between two copies of a table (source
  * extract vs warehouse load, yesterday's snapshot vs a backfill) —
  * the validation the reference's load stage never runs: per-group row
  * counts AND an order-insensitive content checksum, compared
  * group-by-group so a mismatch names the exact partition to re-load
  * instead of "the table differs".
  *
  * The checksum is the SUM of per-row xxhash64 values folded into
  * [0, 2^40) — addition is commutative/associative so the digest is
  * partitioning- and order-invariant, and 2^23 summands of < 2^40 stay
  * far below the 2^63 ANSI overflow line (at larger group sizes the
  * fold modulus simply narrows; collisions remain ~2^-40 per group).
  * Each side reduces map-side to one row per group; the compare joins
  * two group-grain frames — the fact tables themselves never co-shuffle.
  */
object Reconcile {

  /** Order-insensitive group digest of the given columns. */
  private def rowDigest(cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(1099511627776L)) // 2^40

  private def sideSummary(df: DataFrame, groupBy: Column, name: String,
      valueCols: Seq[String]): DataFrame =
    df.groupBy(groupBy.as("grp"))
      .agg(count(lit(1)).as(s"n_$name"),
        sum(rowDigest(valueCols.map(col))).cast(LongType).as(s"sum_$name"))

  /** Compare `left` and `right` per `groupBy` group (e.g. the load-day
    * partition): returns one row per group present on EITHER side with
    * both counts, both digests, and a verdict. Missing groups count 0
    * with a null digest — absence is a mismatch, not an accident.
    */
  def reconcile(left: DataFrame, right: DataFrame, groupBy: Column,
      valueCols: Seq[String]): DataFrame = {
    val l = sideSummary(left, groupBy, "left", valueCols)
    val r = sideSummary(right, groupBy, "right", valueCols)
    l.join(r, Seq("grp"), "full_outer")
      .select(col("grp"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        col("sum_left"), col("sum_right"),
        (coalesce(col("n_left"), lit(0L)) === coalesce(col("n_right"), lit(0L)) &&
          col("sum_left") <=> col("sum_right")).as("is_match"))
      .orderBy(col("grp"))
  }
}
