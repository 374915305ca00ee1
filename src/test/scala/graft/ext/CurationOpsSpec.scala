package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants for the round-8 analytics operators — the DuckDB
  * twins pin exact values; these pin the properties that must survive
  * any future parameter or data change.
  */
class CurationOpsSpec extends SparkSpec {

  test("vocab growth is monotone and ends at the full distinct vocabulary") {
    val rows = TextAnalysis.vocabGrowth(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 10L), "one row per decile step")
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._4 >= a._4 && b._2 >= a._2 }, "vocab and prefix sizes are monotone")
    val fullVocab = graft.engine.Tables(spark, Sf, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .select(countDistinct(col("w"))).head().getLong(0)
    assert(rows.last._4 == fullVocab,
      s"step 10 must reach the full vocabulary (${rows.last._4} vs $fullVocab)")
    assert(rows.map(_._3).sum == fullVocab, "new-token increments partition the vocab")
  }

  test("bpe first merges are single symbols with positive weighted counts") {
    val rows = TextAnalysis.bpeFirstMerges(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (l, r, c) =>
      assert(l.length == 1 && r.length == 1, s"symbols must be single chars: ($l,$r)")
      assert(c > 0, "counts are positive")
    }
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq,
      "ranked by count descending")
  }

  test("correlation matrix values are finite and within [-1, 1]") {
    val row = graft.ops.Profile.correlationMatrix(spark, Sf).head()
    assert(row.getLong(0) > 0, "row count present")
    (1 until row.length).foreach { i =>
      val c = row.getDouble(i)
      assert(!c.isNaN && c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12,
        s"correlation out of range at field $i: $c")
    }
  }

  test("seasonal backtest evaluates exactly the days with a lagged partner") {
    val daily = graft.engine.Tables(spark, Sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val expected7 = daily.as("d").join(daily.as("f"),
        col("d.event_type") === col("f.event_type") &&
          col("f.day") === date_sub(col("d.day"), 7))
      .groupBy(col("d.event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.ops.Scalars.seasonalBacktest(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(6)))
    assert(got.nonEmpty)
    got.foreach { case (et, n7, mae7, mae1) =>
      assert(expected7(et) == n7, s"$et: evaluation-day count mismatch")
      assert(mae7 >= 0.0 && mae1 >= 0.0, "MAE is non-negative")
    }
  }
}
