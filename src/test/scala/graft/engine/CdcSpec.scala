package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x207 CDC apply: a hand-built log exercises every semantic — insert,
  * stale-event skip, update, delete, delete-then-reinsert, untouched
  * passthrough — and re-applying the log (replay) is a no-op.
  */
class CdcSpec extends SparkSpec {

  test("applyCdc semantics: latest wins, deletes remove, replay is idempotent") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val log = Seq(
      (5L, "new", 10L, "I"),   // plain insert
      (2L, "stale", 1L, "U"),  // outranked by seq 7
      (2L, "b2", 7L, "U"),     // update wins
      (3L, "x", 5L, "D"),      // delete
      (4L, "gone", 3L, "D"),   // delete...
      (4L, "back", 8L, "I")    // ...then reinsert at higher seq
    ).toDF("k", "v", "seq", "op")
    val got = Cdc.applyCdc(base, log, "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "b2"), (4L, "back"), (5L, "new")))
    // replay: applying the SAME log to the applied result changes nothing
    val applied = Cdc.applyCdc(base, log, "k")
    val again = Cdc.applyCdc(applied, log, "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === got, "CDC apply must be idempotent under replay")
  }

  test("stateful apply: any batch decomposition equals the one-shot apply") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val events = Seq(
      (2L, "b2", 7L, "U"),     // the winner for key 2
      (2L, "stale", 1L, "U"),  // must lose even if delivered LAST
      (3L, "x", 5L, "D"),      // delete key 3
      (3L, "zombie", 2L, "I"), // late stale insert — must NOT resurrect
      (4L, "new", 10L, "I"),
      (4L, "old", 4L, "U"))    // late event below the applied insert
    val oneShot = Cdc.applyCdc(base, events.toDF("k", "v", "seq", "op"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // adversarial decompositions, including fully reversed delivery
    val splits = Seq(
      events.map(Seq(_)),                       // one event per batch, in order
      events.reverse.map(Seq(_)),               // one per batch, reversed
      Seq(events.take(3), events.drop(3)),      // two halves
      Seq(events.drop(3), events.take(3)))      // two halves, swapped
    splits.foreach { batches =>
      val fin = batches.foldLeft(Cdc.initState(base)) { (st, b) =>
        Cdc.applyCdcStateful(st, b.toDF("k", "v", "seq", "op"), "k")
          .localCheckpoint(true)
      }
      val got = Cdc.snapshot(fin).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === oneShot, s"decomposition $batches diverged")
    }
  }

  test("stateful apply: equal-seq ties resolve by op order in any delivery order") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val u = (1L, "up", 5L, "U")
    val d = (1L, "del", 5L, "D")
    // same seq: U outranks D whichever batch arrives first
    for (order <- Seq(Seq(u, d), Seq(d, u))) {
      val fin = order.foldLeft(Cdc.initState(base)) { (st, e) =>
        Cdc.applyCdcStateful(st, Seq(e).toDF("k", "v", "seq", "op"), "k")
          .localCheckpoint(true)
      }
      val got = Cdc.snapshot(fin).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "up")), s"order $order misresolved the tie")
    }
  }

  test("x207 equals a driver-side replay of the derived log") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100.0).toLong))
    def m(k: Long, d: Long) = ((k % d) + d) % d
    val base = orders.filter(o => m(o._1, 3) == 0)
      .map(o => o._1 -> ((o._2, o._3))).toMap
    var state = base
    // events sorted by seq ascending = sequential replay semantics
    val events = orders.filter(o => m(o._1, 3) == 1)
        .map(o => (o._1 * 10 + 1, o._1, "I", o._2, o._3)) ++
      orders.filter(o => m(o._1, 3) == 0 && m(o._1, 5) == 0)
        .map(o => (o._1 * 10, o._1, "I", "S", 0L)) ++
      orders.filter(o => m(o._1, 3) == 0 && m(o._1, 5) == 0)
        .map(o => (o._1 * 10 + 2, o._1, "U", o._2, o._3 + 117L)) ++
      orders.filter(o => m(o._1, 3) == 0 && m(o._1, 15) == 0)
        .map(o => (o._1 * 10 + 9, o._1, "D", o._2, o._3))
    events.sortBy(_._1).foreach { case (_, k, op, st, c) =>
      if (op == "D") state -= k else state += k -> ((st, c))
    }
    val got = Cdc.cdcApply(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === state)
  }
}
