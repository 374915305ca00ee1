package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based window invariants (SURVEY.md §5.6): for ANY set of
  * rows, the closed day windows partition the data — every row lands in
  * exactly the window of its own date, and the union of all daily
  * increments is the full extract. Timestamps are generated at
  * second granularity including the exact 00:00:00 / 23:59:59 boundary
  * instants the closed interval must keep.
  */
class IncrementalPropSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("updated_at", TimestampType)))

  private val Days = Seq("2024-06-10", "2024-06-11", "2024-06-12")

  // seconds-of-day biased toward the boundaries
  private val secondGen: Gen[Int] = Gen.frequency(
    (1, Gen.const(0)), (1, Gen.const(86399)), (5, Gen.choose(0, 86399)))

  private val rowGen: Gen[(Int, String, Int)] = for {
    id <- Gen.choose(0, 1000000)
    day <- Gen.oneOf(Days)
    sec <- secondGen
  } yield (id, day, sec)

  private def mkDf(rows: List[(Int, String, Int)]) = {
    val data = rows.zipWithIndex.map { case ((_, day, sec), i) =>
      val ts = Timestamp.valueOf(
        java.time.LocalDate.parse(day).atStartOfDay.plusSeconds(sec.toLong))
      Row(i, ts)
    }
    spark.createDataFrame(java.util.Arrays.asList(data: _*), schema)
  }

  test("daily partial aggregates roll up to the direct aggregate, replay-safe") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_runagg").toString + "/agg"
    val ev = Tables(spark, Sf, "events")
    val days = Seq("2024-01-03", "2024-01-04", "2024-01-05")
    days.foreach { ds =>
      Incremental.writeDailyPartials(ev, "ts", ds, Seq("event_type"),
        Seq(count(lit(1)).as("pc"), min(col("value")).as("pmin")), dir)
    }
    // replaying a day must replace, not double, its partials
    Incremental.writeDailyPartials(ev, "ts", days.head, Seq("event_type"),
      Seq(count(lit(1)).as("pc"), min(col("value")).as("pmin")), dir)
    val running = Incremental.readRunningAgg(spark, dir, Seq("event_type"),
      Seq(sum(col("pc")).as("n"), min(col("pmin")).as("mn")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val direct = ev.filter(col("ts").between(
      lit("2024-01-03 00:00:00").cast("timestamp"),
      lit("2024-01-05 23:59:59").cast("timestamp")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(running == direct)
  }

  test("loadTableFor reports exactly the rows it wrote; empty days skip") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_loadfor").toString + "/t"
    val ev = Tables(spark, Sf, "events")
    Incremental.loadTableFor(ev, "ts", "2024-01-03", dir) match {
      case Incremental.Loaded(n) =>
        // the count must describe the WRITTEN output (one persisted
        // snapshot), not a re-scan of the source
        val written = spark.read.parquet(dir).count()
        assert(n > 0 && n == written, s"reported $n, written $written")
        val direct = Incremental.dayWindow(ev, "ts", "2024-01-03").count()
        assert(n == direct)
      case other => fail(s"expected a non-empty day, got $other")
    }
    val before = spark.read.parquet(dir).count()
    assert(Incremental.loadTableFor(ev, "ts", "1999-01-01", dir) == Incremental.SkippedEmpty)
    assert(spark.read.parquet(dir).count() == before, "a skipped day must not touch the sink")
  }

  test("maintainJoin: day-by-day delta joins equal the full recompute, replay-safe") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm").toString + "/enriched"
    val ev = Tables(spark, Sf, "events")
    val dim = Tables(spark, Sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val days = Seq("2024-01-03", "2024-01-04", "2024-01-05")
    days.foreach { ds =>
      val st = Incremental.maintainJoin(ev, dim, Seq("user_id"), "ts", ds, dir)
      assert(st.isInstanceOf[Incremental.Loaded], s"$ds must load rows")
    }
    // a replayed day must overwrite itself, not double-append
    Incremental.maintainJoin(ev, dim, Seq("user_id"), "ts", days(1), dir)
    val incremental = spark.read.parquet(dir)
      .select(col("event_id"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val full = days.map(ds => Incremental.dayWindow(ev, "ts", ds)).reduce(_ unionByName _)
      .join(dim, "user_id")
      .select(col("event_id"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(incremental == full, "delta-join maintenance must equal the recompute")
  }

  test("maintainJoin replaces a stale partition when the dim stops matching") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm2").toString + "/enriched"
    val fact = Seq((1L, 10L, "2024-01-03 08:00:00"), (2L, 20L, "2024-01-03 09:00:00"))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dim = Seq((10L, "A"), (20L, "B")).toDF("user_id", "segment")
    assert(Incremental.maintainJoin(fact, dim, Seq("user_id"), "ts", "2024-01-03", dir)
      == Incremental.Loaded(2))
    assert(spark.read.parquet(dir).count() == 2)
    // replay after the dimension lost every matching key: the partition
    // must be overwritten to the new (empty) truth, not skipped stale
    val dimGone = Seq((99L, "Z")).toDF("user_id", "segment")
    assert(Incremental.maintainJoin(fact, dimGone, Seq("user_id"), "ts", "2024-01-03", dir)
      == Incremental.Loaded(0), "non-empty delta with no matches is a load, not a skip")
    assert(spark.read.parquet(dir).count() == 0, "stale rows must be gone")
    // the dropped-row audit names exactly the unmatched delta rows
    val dropped = Incremental.unmatchedDelta(fact, dimGone, Seq("user_id"), "ts", "2024-01-03")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(dropped == Set(1L, 2L))
    // a day with NO delta rows still skips
    assert(Incremental.maintainJoin(fact, dim, Seq("user_id"), "ts", "2024-01-09", dir)
      == Incremental.SkippedEmpty)
  }

  test("daily windows partition any dataset exactly") {
    val listGen = Gen.listOfN(60, rowGen)
    (1L to 5L).foreach { seed =>
      val rows = listGen.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val df = mkDf(rows)
      val total = df.count()
      val perDay = Days.map(ds => Incremental.dayWindow(df, "updated_at", ds).count())
      assert(perDay.sum == total, s"windows lost or duplicated rows: $perDay vs $total")
      // each row appears in exactly the window of its own day
      Days.zip(perDay).foreach { case (ds, n) =>
        val expected = rows.count { case (_, day, _) => day == ds }
        assert(n == expected, s"seed $seed $ds: window=$n expected=$expected")
      }
    }
  }
}
