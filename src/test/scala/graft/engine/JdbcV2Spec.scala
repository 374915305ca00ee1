package graft.engine

import java.sql.DriverManager

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 JDBC against embedded Derby: arbitrary predicates, column
  * pruning, whole aggregates and top-N all execute database-side —
  * read straight out of the scan's pushdown metadata, not inferred.
  */
class JdbcV2Spec extends SparkSpec {

  private val Url = "jdbc:derby:memory:graftv2;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(Url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE APP.ORDERS " +
        "(ID INT, KIND VARCHAR(10), AMOUNT DOUBLE, UPDATED_AT TIMESTAMP)")
      (1 to 100).foreach { i =>
        val day = if (i <= 40) "2024-01-05" else "2024-01-06"
        st.execute(s"INSERT INTO APP.ORDERS VALUES " +
          s"($i, 'k${i % 3}', ${i * 1.5}, TIMESTAMP('$day 1${i % 10}:00:00'))")
      }
      st.close()
    } finally conn.close()
  }

  private def t = {
    seeded
    JdbcV2.register(spark, "dvc", Url)
    JdbcV2.table(spark, "dvc", "APP", "ORDERS")
  }

  test("arbitrary predicate + projection push down (PushedFilters, ReadSchema)") {
    val q = t.filter(col("ID") > 50 && col("KIND") === "k1").select(col("AMOUNT"))
    val d = JdbcV2.scanDescription(q)
    assert(d.contains("ID > 50"), d)
    assert(d.contains("KIND = 'k1'") || d.contains("KIND IS NOT NULL"), d)
    assert(d.contains("ReadSchema: struct<AMOUNT:double>"), d)
    assert(q.count() === (51 to 100).count(_ % 3 == 1))
  }

  test("S2 day window is a plain filter that pushes (JdbcV2Source)") {
    seeded
    JdbcV2.register(spark, "dvc", Url)
    val src = JdbcV2Source("dvc", "APP", "ORDERS", "UPDATED_AT")
    val day = src.loadDay(spark, "2024-01-05")
    val d = JdbcV2.scanDescription(day)
    assert(d.contains("UPDATED_AT IS NOT NULL") || d.contains("UPDATED_AT >"), d)
    assert(day.count() === 40)
    assert(src.load(spark).count() === 100)
  }

  test("whole aggregate pushes (PushedAggregates + group-by)") {
    val q = t.groupBy(col("KIND")).agg(count(lit(1)).as("n"))
    val d = JdbcV2.scanDescription(q)
    assert(d.contains("PushedAggregates: [COUNT(*)]"), d)
    assert(d.contains("PushedGroupByExpressions: [KIND]"), d)
    assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      (1 to 100).groupBy(i => s"k${i % 3}").view.mapValues(_.size.toLong).toMap)
  }

  test("limit and top-N stay Spark-side by default and are CORRECT") {
    // the safe default: no PushedTopN/PushedLimit in the scan, Spark
    // applies its own CollectLimit/TakeOrdered — results exact
    val topn = t.orderBy(col("AMOUNT").desc).limit(5)
    assert(!JdbcV2.scanDescription(topn).contains("PushedTopN"))
    assert(topn.collect().map(_.getInt(0)).toSeq === (96 to 100).reverse)
    assert(t.limit(7).count() === 7)
  }

  test("corrected dialect: top-N and limit push down AND are value-equal") {
    seeded
    val fix = DerbyTopNDialect.install()
    try {
      JdbcV2.register(spark, "dvcfix", Url, pushDownLimits = true)
      val tbl = JdbcV2.table(spark, "dvcfix", "APP", "ORDERS")
      val topn = tbl.orderBy(col("AMOUNT").desc).limit(5)
      val d = JdbcV2.scanDescription(topn)
      assert(d.contains("PushedTopN"), d)
      // value-equal to the Spark-side evaluation of the same query
      assert(topn.collect().map(_.getInt(0)).toSeq === (96 to 100).reverse,
        "a pushed top-N must return exactly the top rows")
      val lim = tbl.limit(7)
      assert(JdbcV2.scanDescription(lim).contains("PushedLimit"),
        JdbcV2.scanDescription(lim))
      assert(lim.count() === 7L,
        "a pushed bare limit must actually limit")
    } finally DerbyTopNDialect.uninstall(fix)
  }

  test("Derby's limit pushdown is a wrong-results trap — the reason the default is off") {
    // opt in, and the pushed top-N comes back UNLIMITED: DerbyDialect
    // renders an empty limit clause, the database sorts but never
    // limits, and Spark trusts the pushdown. Pinned so an upstream fix
    // (or a dialect change) surfaces as this test failing.
    seeded
    JdbcV2.register(spark, "dvcbad", Url, pushDownLimits = true)
    val topn = JdbcV2.table(spark, "dvcbad", "APP", "ORDERS")
      .orderBy(col("AMOUNT").desc).limit(5)
    val d = JdbcV2.scanDescription(topn)
    assert(d.contains("PushedTopN"), d)
    assert(topn.count() === 100L,
      "Derby now honors pushed limits — flip the register default")
  }
}
