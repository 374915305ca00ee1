package graft.engine

import java.sql.DriverManager

import graft.SparkSpec

/** JdbcSink integration against embedded Derby (the SourceSpec pattern):
  * the windowed load is idempotent (replaying a day deletes its own
  * previous attempt), distinct days accumulate, empty days skip without
  * touching the target, and append/truncate behave like S8/S7.
  */
class JdbcSinkSpec extends SparkSpec {

  private val Url = "jdbc:derby:memory:graftsink;create=true"

  private def withStatement[A](f: java.sql.Statement => A): A = {
    val conn = DriverManager.getConnection(Url)
    try {
      val st = conn.createStatement()
      try f(st) finally st.close()
    } finally conn.close()
  }

  private lazy val created: Unit = withStatement { st =>
    st.execute(
      "CREATE TABLE wh_bookings (book_ref VARCHAR(6), amount INT, updated_at TIMESTAMP)")
  }

  private def target = JdbcSource(Url, "wh_bookings", "updated_at",
    tsLiteral = ts => s"TIMESTAMP('$ts')")

  private def sink = JdbcSink(Url, "wh_bookings", "updated_at",
    tsLiteral = ts => s"TIMESTAMP('$ts')")

  private def mkRows(rows: (String, Int, String)*) = {
    import java.sql.Timestamp
    val data = rows.map { case (r, a, ts) =>
      org.apache.spark.sql.Row(r, a, Timestamp.valueOf(ts))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(data: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("book_ref",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("amount",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("updated_at",
          org.apache.spark.sql.types.TimestampType))))
  }

  private def contents(): Set[(String, Int)] =
    target.load(spark).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet

  test("windowed JDBC load is idempotent and day-scoped") {
    created
    val d1 = mkRows(
      ("AAA", 10, "2024-01-05 00:00:00"),
      ("BBB", 20, "2024-01-05 23:59:59"))
    val d2 = mkRows(("CCC", 30, "2024-01-06 08:00:00"))
    assert(sink.loadDay(d1, "2024-01-05") == Incremental.Loaded(2))
    assert(sink.loadDay(d2, "2024-01-06") == Incremental.Loaded(1))
    assert(contents() == Set(("AAA", 10), ("BBB", 20), ("CCC", 30)))
    // replaying day 1 with a corrected amount REPLACES that day only —
    // the reference's DELETE window + INSERT contract
    val d1Fixed = mkRows(
      ("AAA", 11, "2024-01-05 00:00:00"),
      ("BBB", 20, "2024-01-05 23:59:59"))
    assert(sink.loadDay(d1Fixed, "2024-01-05") == Incremental.Loaded(2))
    assert(contents() == Set(("AAA", 11), ("BBB", 20), ("CCC", 30)))
    // and replaying the identical increment is a no-op
    assert(sink.loadDay(d1Fixed, "2024-01-05") == Incremental.Loaded(2))
    assert(contents() == Set(("AAA", 11), ("BBB", 20), ("CCC", 30)))
  }

  test("rows outside the window never load (idempotency guard)") {
    created
    sink.loadDay(mkRows(("ZZZ", 99, "2024-02-01 12:00:00")), "2024-01-05")
    assert(!contents().contains(("ZZZ", 99)),
      "a row outside ds would survive the replay delete — must be filtered")
    // a frame whose window slice is empty skips without touching the table
    val before = contents()
    assert(sink.loadDay(mkRows(("YYY", 98, "2024-02-01 12:00:00")), "2024-03-01")
      == Incremental.SkippedEmpty)
    assert(contents() == before)
  }

  test("jdbc append accumulates; truncate-load replaces") {
    created
    withStatement(_.execute("CREATE TABLE wh_plain (book_ref VARCHAR(6), amount INT, updated_at TIMESTAMP)"))
    val plainSink = JdbcSink(Url, "wh_plain", "updated_at",
      tsLiteral = ts => s"TIMESTAMP('$ts')")
    val plainSrc = JdbcSource(Url, "wh_plain", "updated_at",
      tsLiteral = ts => s"TIMESTAMP('$ts')")
    plainSink.append(mkRows(("AAA", 1, "2024-01-05 00:00:00")))
    plainSink.append(mkRows(("AAA", 1, "2024-01-05 00:00:00")))
    assert(plainSrc.load(spark).count() == 2, "S8 append must not dedup")
    plainSink.truncateLoad(mkRows(("BBB", 2, "2024-01-06 00:00:00")))
    assert(plainSrc.load(spark).collect().map(_.getString(0)).toSeq == Seq("BBB"),
      "S7 truncate-load replaces all prior rows")
  }
}
