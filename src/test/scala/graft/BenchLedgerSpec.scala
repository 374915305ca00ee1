package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The contention-adjudication contract: after one recorded run, EVERY
  * query has a median, so a phantom on ANY query — including one that
  * never cracked a driver top-30 — triggers the auto-rerun (the
  * round-10 blind spot: s09/q17/q26 escaped because only prior top-30
  * members had medians).
  */
class BenchLedgerSpec extends AnyFunSuite {

  private def tmpDir() = Files.createTempDirectory("graft_ledger")

  test("a first-time-slow query is flagged after one ledger entry") {
    val dir = tmpDir()
    // one full-coverage run: a fast simple query that would never make
    // a driver top-30
    BenchLedger.append(dir, "sf0.1", 32, Map("q17_date_buckets" -> 0.8, "x11" -> 3.2))
    val m = BenchLedger.medians(dir, "sf0.1")
    assert(m("q17_date_buckets") == 0.8 && m("x11") == 3.2)
    // the r10 phantom: 5.59 s vs a 0.8 s median -> rerun fires
    assert(BenchLedger.needsRerun(5.59, m.get("q17_date_buckets")))
    assert(!BenchLedger.needsRerun(0.9, m.get("q17_date_buckets")))
  }

  test("no recorded median means no rerun, and sub-0.5 s spikes are ignored") {
    assert(!BenchLedger.needsRerun(100.0, Option.empty[(Double, Int)]))
    // 0.4 s is >2.5x a 0.1 s median but below the floor: JIT noise
    assert(!BenchLedger.needsRerun(0.4, Some(0.1)))
    assert(BenchLedger.needsRerun(0.6, Some(0.2)))
  }

  test("medians are sf-scoped: iteration runs at another sf do not leak") {
    val dir = tmpDir()
    BenchLedger.append(dir, "sf0.1", 32, Map("q01" -> 2.0))
    BenchLedger.append(dir, "sf0.01", 32, Map("q01" -> 0.1))
    assert(BenchLedger.medians(dir, "sf0.1") == Map("q01" -> 2.0))
    assert(BenchLedger.medians(dir, "sf0.01") == Map("q01" -> 0.1))
  }

  test("driver top-30 records merge into sf0.1 medians only") {
    val dir = tmpDir()
    Files.writeString(dir.resolve("BENCH_r98.json"),
      """{"parsed":{"queries":{"q05":1.0,"x11":2.0}}}""")
    Files.writeString(dir.resolve("BENCH_r99.json"),
      """{"parsed":{"queries":{"q05":3.0}}}""")
    BenchLedger.append(dir, "sf0.1", 32, Map("q05" -> 2.0))
    // q05 observations: 1.0, 3.0, 2.0 -> median 2.0; x11: single obs
    val m = BenchLedger.medians(dir, "sf0.1")
    assert(m("q05") == 2.0 && m("x11") == 2.0)
    assert(BenchLedger.medians(dir, "sf0.01").isEmpty,
      "driver records are sf0.1-scale and must not seed other scales")
  }

  test("malformed ledger lines and files contribute nothing") {
    val dir = tmpDir()
    Files.writeString(dir.resolve(BenchLedger.FileName),
      "not json at all\n{\"sf\":\"sf0.1\",\"queries\":{\"ok\":1.5}}\n")
    Files.writeString(dir.resolve("BENCH_r97.json"), "{broken")
    assert(BenchLedger.medians(dir, "sf0.1") == Map("ok" -> 1.5))
  }

  test("append is cumulative and medians are order-insensitive") {
    val dir = tmpDir()
    Seq(3.0, 1.0, 2.0).foreach(v =>
      BenchLedger.append(dir, "sf0.1", 32, Map("q" -> v)))
    assert(BenchLedger.medians(dir, "sf0.1") == Map("q" -> 2.0))
  }

  test("rerun factor tightens to 2.0x once five samples establish the variance") {
    // the r11 escapes: x82 at 1.9x and x11 at 1.5x of well-established
    // medians slipped under the flat 2.5x trigger
    assert(!BenchLedger.needsRerun(4.26, Some((2.4, 4))), "below 2.5x, few samples")
    assert(BenchLedger.needsRerun(5.0, Some((2.4, 5))), "2.08x with 5 samples fires")
    assert(!BenchLedger.needsRerun(4.26, Some((2.4, 5))), "1.78x never fires")
    assert(BenchLedger.needsRerun(6.1, Some((2.4, 4))), ">2.5x fires regardless")
    // the back-compat Option[Double] form stays loose (unknown count)
    assert(!BenchLedger.needsRerun(5.0, Some(2.4)))
    assert(BenchLedger.needsRerun(6.1, Some(2.4)))
  }

  test("stats expose the sample count medians aggregate over") {
    val dir = tmpDir()
    Seq(3.0, 1.0, 2.0).foreach(v =>
      BenchLedger.append(dir, "sf0.1", 32, Map("q" -> v)))
    assert(BenchLedger.stats(dir, "sf0.1") == Map("q" -> ((2.0, 3))))
  }

  test("medians are data-dir-scoped: 10x and 100x corpora both named sf1 do not collide") {
    val dir = tmpDir()
    // the r16 incident: /tmp/sf10x/sf1 and /tmp/sf100x/sf1 share the
    // basename, so a 100x run was judged against 10x medians and the
    // rerun detector fired on nearly every query
    BenchLedger.append(dir, "sf1", 32, Map("q" -> 2.0), Some("/tmp/sf10x/sf1"))
    BenchLedger.append(dir, "sf1", 32, Map("q" -> 55.0), Some("/tmp/sf100x/sf1"))
    val at10x = BenchLedger.stats(dir, "sf1", 32, Some("/tmp/sf10x/sf1"))
    val at100x = BenchLedger.stats(dir, "sf1", 32, Some("/tmp/sf100x/sf1"))
    assert(at10x == Map("q" -> ((2.0, 1))) && at100x == Map("q" -> ((55.0, 1))))
    // the 100x value vs its OWN median: no spurious rerun
    assert(!BenchLedger.needsRerun(55.0, at100x.get("q")))
    // a dir-less reader still sees tagged lines through the sf name
    assert(BenchLedger.stats(dir, "sf1", 32)("q")._2 == 2)
  }

  test("medians are cpus-scoped: a local[4] debug run does not poison local[32]") {
    val dir = tmpDir()
    BenchLedger.append(dir, "sf0.1", 32, Map("q29" -> 1.9))
    // the r11 incident: the same query measures ~4.3 s on 4 cores —
    // same plan, fewer cores; it must not drag the 32-core median
    BenchLedger.append(dir, "sf0.1", 4, Map("q29" -> 4.3))
    assert(BenchLedger.medians(dir, "sf0.1", 32) == Map("q29" -> 1.9))
    assert(BenchLedger.medians(dir, "sf0.1", 4) == Map("q29" -> 4.3))
    // legacy untagged lines were all recorded at the driver's 32
    Files.writeString(dir.resolve(BenchLedger.FileName),
      "{\"sf\":\"sf0.1\",\"queries\":{\"legacy\":1.0}}\n",
      java.nio.file.StandardOpenOption.APPEND)
    assert(BenchLedger.medians(dir, "sf0.1", 32)("legacy") == 1.0)
    assert(!BenchLedger.medians(dir, "sf0.1", 4).contains("legacy"))
    // driver top-30 records are local[32] evidence only
    Files.writeString(dir.resolve("BENCH_r99.json"),
      """{"parsed":{"queries":{"drv":2.0}}}""")
    assert(BenchLedger.medians(dir, "sf0.1", 32)("drv") == 2.0)
    assert(!BenchLedger.medians(dir, "sf0.1", 4).contains("drv"))
  }
}
