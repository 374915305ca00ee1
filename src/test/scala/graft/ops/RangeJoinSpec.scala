package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binned range join semantics: half-open boundaries, bin-width
  * invariance (the binning is an execution detail, never a semantics
  * change), and the equi-join plan (no nested loop).
  */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def points = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-01 11:00:00")), // exactly at an interval end
      (4L, ts("2024-01-01 23:59:59")),
      (5L, ts("2024-01-02 03:00:00"))
    ).toDF("pid", "ts")
  }

  private def intervals = {
    import spark.implicits._
    Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (200L, ts("2024-01-01 22:00:00"), ts("2024-01-02 04:00:00"))
    ).toDF("iid", "start", "end")
  }

  private def pairs(binSeconds: Long) =
    RangeJoin.binnedRangeJoin(points, intervals, "ts", "start", "end", binSeconds)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("half-open [start, end): start inclusive, end exclusive, spans bins") {
    assert(pairs(3600L) == Set((1L, 100L), (2L, 100L), (4L, 200L), (5L, 200L)),
      "pid 1 at start is in, pid 3 at end is out, 200 spans midnight")
  }

  test("bin width never changes the result") {
    val expected = pairs(3600L)
    Seq(60L, 599L, 7200L, 86400L).foreach { w =>
      assert(pairs(w) == expected, s"bin width $w changed the join result")
    }
  }

  test("randomized range joins match the brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = ts("2024-01-01 00:00:00").getTime
    def t(off: Long) = new Timestamp(base + off * 1000)
    for (_ <- 1 to 3) {
      val pts = (1 to 150).map(i => (i.toLong, t(rnd.nextInt(50000).toLong)))
      val ivs = (1 to 40).map { i =>
        val s = rnd.nextInt(50000)
        (i.toLong, t(s.toLong), t((s + 1 + rnd.nextInt(8000)).toLong))
      }
      val got = RangeJoin.binnedRangeJoin(
        pts.toDF("pid", "ts"), ivs.toDF("iid", "start", "end"),
        "ts", "start", "end", binSeconds = 777L)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (pid, pt) <- pts
        (iid, s, e) <- ivs
        if !pt.before(s) && pt.before(e)
      } yield (pid, iid)).toSet
      assert(got == expected)
    }
  }

  test("the plan is an equi-join on the bin, not a nested loop") {
    val plan = RangeJoin.binnedRangeJoin(points, intervals, "ts", "start", "end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
