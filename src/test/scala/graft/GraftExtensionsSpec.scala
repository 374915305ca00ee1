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
      // nfc_normalize composes "e"+U+0301 into U+00E9 from pure SQL
      val nfc = s2.sql("SELECT nfc_normalize('café') AS s").head().getString(0)
      assert(nfc == "café" && nfc.length == 4, s"expected composed form, got $nfc")
      // the optimizer rule rewrites the naive count spelling to the
      // native expression (non-constant input — a literal would just
      // constant-fold straight through the rewritten expression)
      s2.range(3).selectExpr("concat('a b, c', CAST(id AS STRING)) AS t")
        .createOrReplaceTempView("naive_src")
      val naive = s2.sql(
        s"SELECT size(regexp_extract_all(t, '${graft.ext.TextAnalysis.BpePattern.replace("\\", "\\\\")}', 0)) AS n FROM naive_src")
      assert(naive.queryExecution.optimizedPlan.toString.contains("bpe_token_count"),
        s"rewrite must fire:\n${naive.queryExecution.optimizedPlan}")
      // "a b, c<digit>" -> [a][b][,][c<digit>… letters+digit split] = 5 tokens
      assert(naive.collect().map(_.getInt(0)).toSeq == Seq(5, 5, 5))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
