package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The CDC hot-key skew fixture: ONE key carries half the log (an
  * entity rewritten in a tight loop — the classic CDC skew shape). The
  * per-key argmax must be an aggregate with map-side PARTIAL
  * aggregation, which reduces the hot key to one candidate per input
  * partition BEFORE the shuffle — a `row_number` window would have to
  * co-locate the whole hot partition in one task, a straggler no AQE
  * setting can split. Pinned at the plan level (partial max_by present,
  * no Window in the apply path) and at the value level (the aggregate
  * argmax equals the window argmax on the same skewed log).
  */
class CdcSkewSpec extends SparkSpec {

  import spark.implicits._

  /** 50k-event log, 50% on key 0, payload (k, v); seq unique per key. */
  private def skewedLog = {
    val n = 50000L
    spark.range(n).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(col("id") % 997L + 1L).as("k"),
      concat(lit("v"), col("id")).as("v"),
      col("id").as("seq"),
      when(col("id") % 19 === 0, "D").otherwise("U").as("op"))
      .repartition(8) // several input partitions, each carrying hot rows
  }

  private def base = Seq((0L, "base0"), (1L, "base1"), (5000L, "base5000"))
    .toDF("k", "v")

  test("per-key argmax is a partial-aggregating max_by, not a window") {
    val plan = Cdc.applyCdc(base, skewedLog, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("max_by"),
      s"the argmax must be the max_by aggregate:\n$plan")
    assert(plan.toLowerCase.contains("partial_max_by"),
      s"map-side partial aggregation must engage (the skew defense):\n$plan")
    assert(!plan.contains("Window"),
      s"no window partition may co-locate the hot key:\n$plan")
    val statefulPlan = Cdc.applyCdcStateful(Cdc.initState(base), skewedLog, "k")
      .queryExecution.executedPlan.toString
    assert(statefulPlan.toLowerCase.contains("partial_max_by"), statefulPlan)
    assert(!statefulPlan.contains("Window"), statefulPlan)
  }

  test("aggregate argmax == window argmax on the skewed log (values)") {
    val log = skewedLog.cache()
    try {
      val viaAgg = Cdc.applyCdc(base, log, "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // the reference semantics, computed the straggler way
      val latest = log
        .withColumn("rk", row_number().over(Window.partitionBy(col("k"))
          .orderBy(col("seq").desc, col("op").desc)))
        .filter(col("rk") === 1).drop("rk")
      val viaWindow = base.join(latest.select(col("k")), Seq("k"), "left_anti")
        .unionByName(latest.filter(col("op") =!= "D").select(col("k"), col("v")))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaAgg === viaWindow)
      // sanity on the fixture itself: the hot key is half the log and
      // its final state is the argmax event
      assert(log.filter(col("k") === 0L).count() === 25000L)
      val hot = viaAgg.filter(_._1 == 0L)
      assert(hot === Set((0L, "v49998")),
        "the hot key's winner must be its greatest-seq non-delete event")
    } finally { log.unpersist(); () }
  }

  test("stateful fold under skew: batch splits reproduce the one-shot apply") {
    val log = skewedLog.cache()
    try {
      val oneShot = Cdc.snapshot(
        Cdc.applyCdcStateful(Cdc.initState(base), log, "k"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val folded = (0 until 4).map(i => log.filter(col("seq") % 4 === i.toLong))
        .foldLeft(Cdc.initState(base)) { (st, b) =>
          Cdc.applyCdcStateful(st, b, "k").localCheckpoint(true)
        }
      val foldedSet = Cdc.snapshot(folded)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(foldedSet === oneShot)
    } finally { log.unpersist(); () }
  }
}
