package graft

import org.apache.spark.sql.SparkSession

/** The extensions entry point must make `parse_point` available to pure
  * SQL in a fresh session — no code-side registration call.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects parse_point into a new session") {
    // force the shared session (and its SparkContext) to exist first
    spark.range(1).count()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT parse_point('(1.5,-2.25)') AS p")
        .selectExpr("p.lon", "p.lat").head()
      assert(r.getDouble(0) == 1.5 && r.getDouble(1) == -2.25)
      val n = s2.sql("SELECT bpe_token_count('hello, world 42') AS n").head().getInt(0)
      assert(n == 4, s"expected [hello][,][world][42], got $n")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
