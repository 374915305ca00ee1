package graft.ops

import graft.SparkSpec

/** Error-bound contracts for the sketch aggregates (no SQL oracle —
  * HLL++/KLL are engine-specific; the exact columns in the same result
  * are the reference).
  */
class SketchesSpec extends SparkSpec {

  private lazy val rows = Sketches.eventSketches(spark, Sf).collect()

  test("approx distinct within the HLL++ default rsd against exact") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_users_exact").toDouble
      val approx = r.getAs[Long]("n_users_approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx median lands between the exact p50 neighborhood") {
    rows.foreach { r =>
      val p50 = r.getAs[Double]("p50_exact")
      val p90 = r.getAs[Double]("p90_exact")
      val p50a = r.getAs[Double]("p50_approx")
      assert(p50 <= p90, "exact percentiles must be ordered")
      // with accuracy 10000 on these group sizes the approx median is exact
      assert(math.abs(p50a - p50) <= math.max(1e-9, (p90 - p50) * 0.1),
        s"${r.getString(0)}: approx median $p50a vs exact $p50")
    }
  }

  test("count-min estimates never undercount and stay within eps * N") {
    val hh = Sketches.tokenHeavyHitters(spark, Sf).collect()
    assert(hh.nonEmpty)
    val totalTokens = graft.engine.Tables(spark, Sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.lower(
              org.apache.spark.sql.functions.col("text"))), "\\s+")))
      .count()
    hh.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getLong(2)
      assert(est >= exact, s"'${r.getString(0)}': CMS undercounted $est < $exact")
      assert(est <= exact + (0.001 * totalTokens).ceil.toLong + 1,
        s"'${r.getString(0)}': CMS estimate $est beyond the eps bound over $exact")
    }
  }

  test("union of daily HLL partials equals the one-shot sketch and tracks exact") {
    import org.apache.spark.sql.functions._
    val ev = graft.engine.Tables(spark, Sf, "events")
    val merged = Sketches.hllDailyMerge(spark, Sf).collect()
    assert(merged.nonEmpty)
    // per-day estimates track the per-day exact counts (daily cardinalities
    // are small enough that the sketch is near-exact there)
    merged.foreach { r =>
      val exact = r.getAs[Long]("n_users_day_exact").toDouble
      val est = r.getAs[Long]("n_users_day_est").toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"day ${r.get(0)}: daily HLL estimate $est vs exact $exact")
    }
    // the merged estimate from partials is EXACTLY the one-shot sketch's —
    // the lossless-merge property incremental maintenance relies on
    val oneShot = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getAs[Long]("est")
    val fromPartials = merged.head.getAs[Long]("n_users_total_est")
    assert(fromPartials === oneShot,
      s"union-of-partials $fromPartials != one-shot sketch $oneShot")
    // and it tracks the exact overall distinct within HLL error
    val exactTotal = ev.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(fromPartials - exactTotal) / exactTotal <= 0.05,
      s"merged estimate $fromPartials vs exact $exactTotal")
  }
}
