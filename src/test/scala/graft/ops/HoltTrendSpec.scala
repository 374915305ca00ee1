package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, count, lit, to_date}

/** x198 Holt's linear trend: the per-day (level, trend, fitted, resid)
  * must equal a driver-side sequential fold with the same α=β=1/4
  * updates and (y₁, 0) init.
  */
class HoltTrendSpec extends SparkSpec {

  test("x198 equals the driver-side sequential Holt fold") {
    val daily = spark.read.parquet(s"$Sf/events.parquet")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val truth = daily.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val series = rows.sortBy(_._2)
      var l = series.head._3.toDouble
      var b = 0.0
      series.zipWithIndex.map { case ((_, day, x), i) =>
        val (fitted, resid) =
          if (i == 0) (l + b, x.toDouble - l - b)
          else {
            val f = l + b
            // resid spelled x - l - b (sequential subtraction), matching
            // the engine's expression tree ULP-for-ULP
            val e = x.toDouble - l - b
            val l2 = (x + 3.0 * (l + b)) / 4.0
            val b2 = (l2 - l + 3.0 * b) / 4.0
            l = l2; b = b2
            (f, e)
          }
        (tpe, day) -> ((l, b, fitted, resid))
      }
    }.toMap
    val got = DataQuality.holtTrend(spark, Sf).collect()
    assert(got.length === truth.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toString)
      val (l, b, f, e) = truth(key)
      assert(r.getDouble(3) === l, s"level of $key")
      assert(r.getDouble(4) === b, s"trend of $key")
      assert(r.getDouble(5) === f, s"fitted of $key")
      assert(r.getDouble(6) === e, s"resid of $key")
      assert(r.getDouble(7) === l + 7.0 * b, s"forecast of $key")
    }
  }
}
