package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, unix_micros}

/** x203 Kaplan–Meier: the curve must equal a driver-side product-limit
  * recomputation with the same lifetimes, censoring rule, and pinned
  * ascending-day fold.
  */
class KaplanMeierSpec extends SparkSpec {

  test("x203 equals the driver-side product-limit reference") {
    val DayUs = 86400000000L
    val ev = graft.engine.Tables(spark, Sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val endUs = ev.map(_._2).max
    val users = ev.groupBy(_._1).values.map { es =>
      val (first, last) = (es.map(_._2).min, es.map(_._2).max)
      (math.floor((last - first).toDouble / DayUs).toLong,
        last >= endUs - DayUs)
    }.toSeq
    val byDay = users.groupBy(_._1).map { case (d, g) =>
      d -> ((g.count(!_._2).toLong, g.count(_._2).toLong))
    }
    val days = byDay.keys.toSeq.sorted
    var surv = 1.0
    val truth = days.map { d =>
      val (churn, cens) = byDay(d)
      val nRisk = days.filter(_ >= d).map(x => byDay(x)._1 + byDay(x)._2).sum
      surv = surv * (1.0 - churn.toDouble / nRisk.toDouble)
      (d, churn, cens, nRisk, surv)
    }
    val got = DataQuality.kaplanMeier(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq === truth)
    // survival is non-increasing and within (0, 1]
    val s = got.map(_._5)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
    assert(s.forall(v => v > 0.0 && v <= 1.0))
    // both the churn and the censoring path are exercised
    assert(got.map(_._2).sum > 0 && got.map(_._3).sum > 0)
  }
}
