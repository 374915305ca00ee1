package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The streaming join-view contract: view snapshots accumulated across
  * micro-batches (with both tables' inserts interleaved arbitrarily)
  * equal the monolithic join as a multiset, and replayed batches never
  * double-commit any of the three tables.
  */
class ViewIngestSpec extends SparkSpec {

  test("snapshot-maintained join view equals the monolithic join; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft_vidx").toString
    val l = graft.engine.Tables(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect().map(r => ("L", r.getLong(0), r.getInt(1), r.getDouble(2), ""))
    val o = graft.engine.Tables(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .collect().map(r => ("O", r.getLong(0), -1, 0.0, r.getString(1)))
    // interleave both tables' rows, then split into three batches so
    // deltas of each side land in different batches
    val all = (l ++ o).sortBy(t => (t._2, t._1)) // by key then side
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Int, Double, String)]
    val q = ViewIngest.streamingViewMaintain(
      in.toDF().toDF("side", "l_orderkey", "l_linenumber", "l_quantity",
        "o_orderpriority"),
      s"$dirs/view", s"$dirs/ckpt")
    try {
      all.grouped((all.length + 2) / 3).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      assert(graft.engine.VersionedTable.versions(spark, s"$dirs/view/V").size === 3)
      val streamed = ViewIngest.viewFromSnapshots(spark, s"$dirs/view")
        .collect().map(_.toString).sorted.toSeq
      val mono = graft.engine.Tables(spark, Sf, "lineitem").as("l")
        .join(graft.engine.Tables(spark, Sf, "orders").as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("o_orderpriority"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === mono,
        "streaming-maintained view must equal the monolithic join")
      // replay: re-committing batch 0 is skipped on every table
      val bogus = spark.range(1).selectExpr("CAST(1 AS BIGINT) AS l_orderkey",
        "1 AS l_linenumber", "CAST(1 AS DOUBLE) AS l_quantity",
        "'X' AS o_orderpriority")
      graft.engine.VersionedTable.commitIfAbsent(bogus, s"$dirs/view/V", 0L)
      val after = ViewIngest.viewFromSnapshots(spark, s"$dirs/view")
        .collect().map(_.toString).sorted.toSeq
      assert(after === mono, "replay must not alter the maintained view")
    } finally q.stop()
  }
}
