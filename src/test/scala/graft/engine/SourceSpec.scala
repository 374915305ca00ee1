package graft.engine

import java.sql.DriverManager

import graft.SparkSpec

/** JdbcSource integration against embedded Derby (the JDBC driver that
  * ships with Spark): the full extract sees every row, the day-window
  * extract sees exactly the reference's closed interval, and the window
  * SQL is the database-side subquery (pushdown by construction).
  * ParquetSource is exercised on the driver fixtures for S1/S2 parity.
  */
class SourceSpec extends SparkSpec {

  private val Url = "jdbc:derby:memory:graftsrc;create=true"

  private def withDerby[A](f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(Url)
    try f(conn) finally conn.close()
  }

  private lazy val seeded: Unit = withDerby { conn =>
    val st = conn.createStatement()
    st.execute(
      "CREATE TABLE bookings (book_ref VARCHAR(6), amount INT, updated_at TIMESTAMP)")
    Seq(
      ("AAA", 10, "2024-01-04 23:59:59"),
      ("BBB", 20, "2024-01-05 00:00:00"),
      ("CCC", 30, "2024-01-05 12:30:00"),
      ("DDD", 40, "2024-01-05 23:59:59"),
      ("EEE", 50, "2024-01-06 00:00:00")
    ).foreach { case (r, a, ts) =>
      st.execute(s"INSERT INTO bookings VALUES ('$r', $a, TIMESTAMP('$ts'))")
    }
    st.close()
  }

  private val src = JdbcSource(Url, "bookings", "updated_at",
    tsLiteral = ts => s"TIMESTAMP('$ts')")

  test("jdbc full extract reads every row") {
    seeded
    assert(src.load(spark).count() == 5)
  }

  test("jdbc day window is closed-interval and runs inside the database") {
    seeded
    val day = src.loadDay(spark, "2024-01-05")
    val refs = day.select("book_ref").collect().map(_.getString(0)).sorted.toSeq
    assert(refs == Seq("BBB", "CCC", "DDD"), "both boundaries inclusive, outside days excluded")
    // the window ships inside the dbtable subquery — database-side, not
    // a Spark post-filter
    assert(src.dayWindowSql("2024-01-05").contains(
      "WHERE updated_at BETWEEN TIMESTAMP('2024-01-05 00:00:00') AND TIMESTAMP('2024-01-05 23:59:59')"))
    assert(day.queryExecution.executedPlan.toString.contains("JDBCRelation"))
  }

  test("jdbc partitioned extract splits into N parallel reads, data complete") {
    seeded
    val partitioned = JdbcSource(Url, "bookings", "updated_at",
      options = Map(
        "partitionColumn" -> "amount",
        "lowerBound" -> "0", "upperBound" -> "60",
        "numPartitions" -> "3"),
      tsLiteral = ts => s"TIMESTAMP('$ts')")
    val df = partitioned.load(spark)
    assert(df.rdd.getNumPartitions == 3,
      "the JDBC scale knob: one connection per stride partition")
    assert(df.count() == 5, "stride partitioning must not lose boundary rows")
  }

  test("parquet source day window matches Incremental.dayWindow") {
    val ps = ParquetSource(s"$Sf/orders.parquet", "o_orderdate")
    val viaSource = ps.loadDay(spark, "1997-03-01").count()
    val direct = Incremental.dayWindow(
      spark.read.parquet(s"$Sf/orders.parquet"), "o_orderdate", "1997-03-01").count()
    assert(viaSource == direct)
  }
}
