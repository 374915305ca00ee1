package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based sessionization invariants: for ANY event stream, the
  * gap rule is exactly the session-boundary rule — consecutive events
  * inside a session are <= gap apart, every session start is > gap from
  * its user's previous event (or is the first event), sessions number
  * densely from 1, and no event is lost or duplicated.
  */
class SessionizePropSpec extends SparkSpec {

  private val GapS = 1800L

  // epoch seconds across ~2 days, biased to cluster around multiples of
  // the gap so boundary-exact deltas (== gap, == gap+1) actually occur
  private val eventGen: Gen[(Long, Long)] = for {
    user <- Gen.choose(1L, 5L)
    base <- Gen.choose(0L, 48L * 3600L)
    jitter <- Gen.frequency(
      (2, Gen.oneOf(0L, GapS, GapS + 1L)),
      (5, Gen.choose(0L, 2L * GapS)))
  } yield (user, 1704067200L + base + jitter) // 2024-01-01 UTC

  private def streams(seed: Long): List[(Long, Long)] =
    Gen.listOfN(300, eventGen).pureApply(Gen.Parameters.default, Seed(seed))

  test("gap rule == boundary rule; dense numbering; nothing lost") {
    import spark.implicits._
    Seq(11L, 22L, 33L).foreach { seed =>
      val rows = streams(seed).zipWithIndex
        .map { case ((u, ep), i) => (i.toLong, u, new Timestamp(ep * 1000L), "e") }
      val df = rows.toDF("event_id", "user_id", "ts", "event_type")
      val out = Scalars.sessionAssignedDf(df, GapS)
        .select(col("user_id"), col("session_idx"), col("epoch_s"), col("event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.length == rows.length, "no event lost or duplicated")
      out.groupBy(_._1).foreach { case (user, evs) =>
        val ordered = evs.sortBy(e => (e._3, e._4))
        // dense numbering from 1, non-decreasing along the stream
        assert(ordered.head._2 == 1L, s"user $user first session is 1")
        ordered.sliding(2).foreach {
          case Array((_, s1, t1, _), (_, s2, t2, _)) =>
            val delta = t2 - t1
            if (s2 == s1) assert(delta <= GapS,
              s"user $user: in-session delta $delta exceeds the gap")
            else {
              assert(s2 == s1 + 1, s"user $user: session ids must be dense")
              assert(delta > GapS,
                s"user $user: boundary delta $delta must exceed the gap")
            }
          case _ => ()
        }
      }
    }
  }

  test("q82 attribution matches a driver-side last-touch reference") {
    val ev = graft.engine.Tables(spark, Sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val touches = ev.filter(t => t._3 == "click" || t._3 == "view")
      .groupBy(_._2).view.mapValues(_.sortBy(t => (t._4, t._1)).toSeq).toMap
    val expected = ev.filter(_._3 == "purchase").sortBy(_._1).map {
      case (pid, uid, _, pe) =>
        val last = touches.getOrElse(uid, Seq.empty[(Long, Long, String, Long)])
          .filter(t => t._4 < pe || (t._4 == pe && t._1 < pid)).lastOption
        last match {
          case Some((tid, _, tt, te)) if pe - te <= 7L * 86400L =>
            (pid, uid, Some(tid), Some(tt), Some(pe - te), true)
          case _ => (pid, uid, None, None, None, false)
        }
    }
    val got = Scalars.attribution(spark, Sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getBoolean(6))
    }
    assert(got.toSeq === expected.toSeq)
    // every purchase appears exactly once, attributed or not
    assert(got.length === ev.count(_._3 == "purchase"))
  }
}
