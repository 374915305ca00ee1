package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x201 episode mining: the fixture result must equal a driver-side
  * brute-force windowed-subsequence check, and a planted dense stream
  * must surface its length-3 episode (the fixture's event gaps are too
  * wide for any L3 pattern — verified, not assumed).
  */
class SeqPatternsSpec extends SparkSpec {

  private val W = 3600000000L

  test("x201 equals the driver-side windowed-episode reference") {
    val ev = graft.engine.Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => (e._2, e._3)).sortBy(_._2)
    }
    val types = ev.map(_._2).distinct.sorted
    val nUsers = byUser.size
    val minSup = math.min(30L, nUsers.toLong) // fixture-size guard
    def l2Supported(es: Seq[(String, Long)], a: String, b: String): Boolean =
      es.exists { case (t1, ts1) => t1 == a &&
        es.exists { case (t2, ts2) => t2 == b && ts2 > ts1 && ts2 - ts1 <= W } }
    def l3Supported(es: Seq[(String, Long)], a: String, b: String,
        c: String): Boolean =
      es.exists { case (t2, tb) => t2 == b &&
        es.exists { case (t1, ta) => t1 == a && tb > ta && tb - ta <= W } &&
        es.exists { case (t3, tc) => t3 == c && tc > tb && tc - tb <= W } }
    val truth = scala.collection.mutable.Set[(String, Int, Long)]()
    types.foreach { t =>
      val sup = byUser.values.count(_.exists(_._1 == t)).toLong
      if (sup >= minSup) truth += ((t, 1, sup))
    }
    val l2f = scala.collection.mutable.Set[(String, String)]()
    for (a <- types; b <- types) {
      val sup = byUser.values.count(es => l2Supported(es, a, b)).toLong
      if (sup >= minSup) { truth += ((s"$a>$b", 2, sup)); l2f += ((a, b)) }
    }
    for (a <- types; b <- types; c <- types if l2f.contains((a, b))) {
      val sup = byUser.values.count(es => l3Supported(es, a, b, c)).toLong
      if (sup >= minSup) truth += ((s"$a>$b>$c", 3, sup))
    }
    val got = Scalars.seqPatterns(spark, Sf, minSup = minSup).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === truth.toSet)
    // L1 is guaranteed non-empty; L2/L3 presence is sf-dependent (the
    // sf0.001 stream is too sparse for 1-hour windows — the planted
    // test below owns the multi-level path)
    assert(got.exists(_._2 == 1))
  }

  test("x201 surfaces a planted length-3 episode on a dense stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seq").toString
    // two users replaying view->click->purchase minutes apart; a third
    // user with the same types but days apart (outside every window)
    val base = 1700000000000000L
    val rows = (0 until 2).flatMap { u =>
      Seq((u.toLong * 3 + 1, u.toLong, "view", base + u * 10000000L),
        (u.toLong * 3 + 2, u.toLong, "click", base + u * 10000000L + 60000000L),
        (u.toLong * 3 + 3, u.toLong, "purchase", base + u * 10000000L + 120000000L))
    } ++ Seq((100L, 9L, "view", base), (101L, 9L, "click", base + 90L * W),
      (102L, 9L, "purchase", base + 180L * W))
    rows.toDF("event_id", "user_id", "event_type", "us")
      .selectExpr("event_id", "user_id", "event_type",
        "timestamp_micros(us) AS ts", "CAST(0.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Scalars.seqPatterns(spark, dir, minSup = 2L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.contains(("view>click>purchase", 3, 2L)),
      s"planted episode missing from ${got.toSeq}")
    // the days-apart user never supports the windowed pattern
    assert(!got.contains(("view>click>purchase", 3, 3L)))
  }
}
