package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reconciliation contracts: identical copies match everywhere, any
  * mutation / missing row / missing partition flags EXACTLY its group,
  * and the digest is order- and partitioning-invariant.
  */
class ReconcileSpec extends SparkSpec {

  private val valueCols = Seq("event_id", "event_type", "value")

  test("a table reconciles with itself regardless of partitioning") {
    val ev = Tables(spark, Sf, "events")
    val out = Reconcile.reconcile(ev, ev.repartition(7), to_date(col("ts")), valueCols)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("is_match")), "identical copies must match")
  }

  test("a mutated row, a dropped row, and a dropped day each flag their group only") {
    val ev = Tables(spark, Sf, "events")
    val someDay = ev.select(to_date(col("ts")).as("d")).groupBy(col("d")).count()
      .orderBy(col("d")).collect()(2).getDate(0).toString
    val mutated = ev.withColumn("value",
      when(col("event_id") === 7L, col("value") + 1.0).otherwise(col("value")))
    val dayOf7 = ev.filter(col("event_id") === 7L)
      .select(to_date(col("ts"))).collect()(0).getDate(0).toString
    val r1 = Reconcile.reconcile(ev, mutated, to_date(col("ts")), valueCols).collect()
    r1.foreach { row =>
      val expect = row.getDate(0).toString != dayOf7
      assert(row.getAs[Boolean]("is_match") == expect,
        s"day ${row.getDate(0)}: only event 7's day may mismatch")
    }
    // counts equal but content differs: the digest catches what row counts miss
    val flagged = r1.filter(!_.getAs[Boolean]("is_match"))(0)
    assert(flagged.getLong(1) == flagged.getLong(2), "same counts, differing digest")
    // a dropped day appears with n_right = 0, not silently absent
    val r2 = Reconcile.reconcile(ev,
      ev.filter(to_date(col("ts")) =!= lit(someDay).cast("date")),
      to_date(col("ts")), valueCols).collect()
    val gone = r2.filter(_.getDate(0).toString == someDay)
    assert(gone.length == 1 && !gone(0).getAs[Boolean]("is_match")
      && gone(0).getLong(2) == 0L, "missing partition must surface as a zero-count row")
    assert(r2.count(!_.getAs[Boolean]("is_match")) == 1)
  }
}
