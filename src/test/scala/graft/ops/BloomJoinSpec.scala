package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-pruned semi join contracts: the sketch pre-filter must be a
  * pure optimization — identical output to the plain semi join — while
  * actually pruning the fact side (bounded false positives).
  */
class BloomJoinSpec extends SparkSpec {

  test("bloom pre-filter never loses a true match and bounds false positives") {
    val ev = graft.engine.Tables(spark, Sf, "events")
    val dim = graft.engine.Tables(spark, Sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    val sketch = BloomJoin.buildBloom(dim, "user_id", 100000L)
    val pruned = ev.filter(BloomJoin.mightContain(sketch, col("user_id")))
    // no false negatives: every true-match row survives the pre-filter
    val trueRows = ev.join(dim, Seq("user_id"), "left_semi").count()
    val prunedTrueRows = pruned.join(dim, Seq("user_id"), "left_semi").count()
    assert(prunedTrueRows == trueRows, "bloom filters must never drop a member")
    // real pruning with bounded false positives: the pass-through is
    // close to the true match count, far below the full table
    val total = ev.count()
    val passed = pruned.count()
    assert(passed >= trueRows)
    assert(passed < total, s"pre-filter must prune something ($passed of $total)")
    assert(passed <= trueRows + (total * 0.05).toLong,
      s"false-positive blowup: $passed passed vs $trueRows true of $total")
  }

  test("bloom semi reduction equals the plain semi join aggregate") {
    val viaBloom = BloomJoin.bloomSemiReduction(spark, Sf).collect().toSeq
    val dim = graft.engine.Tables(spark, Sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    val plain = graft.engine.Tables(spark, Sf, "events")
      .join(dim, Seq("user_id"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type")).collect().toSeq
    assert(viaBloom == plain)
  }
}
