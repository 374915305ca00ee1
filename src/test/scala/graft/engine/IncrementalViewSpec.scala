package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x202 join-view maintenance: the folded deltas must equal the
  * monolithic join as a MULTISET (no duplicate, no missed term), and a
  * hand-built case exercises each of the three delta terms explicitly.
  */
class IncrementalViewSpec extends SparkSpec {

  test("maintained lineitem/orders view equals the rebuild, no duplicates") {
    val got = graft.ops.Relational.ivmJoin(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
    val rebuilt = Tables(spark, Sf, "lineitem").as("l")
      .join(Tables(spark, Sf, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
    // multiset equality: a duplicated delta term would double rows, a
    // missed term would drop them — either breaks this
    assert(got.sorted.toSeq === rebuilt.sorted.toSeq)
  }

  test("each delta term fires: A-before-B, B-before-A, same-batch") {
    import spark.implicits._
    val a1 = Seq((1L, "a1")).toDF("k", "av") // batch 1: A only
    val b1 = Seq.empty[(Long, String)].toDF("k", "bv")
    val a2 = Seq((3L, "a3")).toDF("k", "av") // batch 2: B matches old A,
    val b2 = Seq((1L, "b1"), (3L, "b3")).toDF("k", "bv") // + same-batch pair
    val a3 = Seq((1L, "a1x")).toDF("k", "av") // batch 3: A matches old B
    val b3 = Seq.empty[(Long, String)].toDF("k", "bv")
    val v = IncrementalView.maintain(
      Seq((a1, b1), (a2, b2), (a3, b3)), Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(v === Set(
      (1L, "a1", "b1"),   // A_old ⋈ ΔB
      (3L, "a3", "b3"),   // ΔA ⋈ ΔB
      (1L, "a1x", "b1"))) // ΔA ⋈ B_old
  }
}
