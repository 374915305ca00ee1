package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** O3 contracts: transient failures retry with backoff and succeed, the
  * alert hook fires exactly once on exhaustion, and the failure still
  * propagates (a load that never succeeded must fail the run).
  */
class ReliabilitySpec extends AnyFunSuite {

  test("transient failure retries and returns the eventual result") {
    var calls = 0
    val events = scala.collection.mutable.ListBuffer.empty[Reliability.Attempt]
    val out = Reliability.withRetry("t", maxAttempts = 3, baseDelayMs = 1,
      onEvent = events += _) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls")
      42
    }
    assert(out == 42 && calls == 3)
    assert(events.map(_.attempt).toList == List(1, 2, 3))
    assert(events.take(2).forall(_.error.isDefined) && events.last.error.isEmpty)
  }

  test("exhausted attempts alert once and rethrow") {
    var alerts = 0
    val e = intercept[RuntimeException] {
      Reliability.withRetry("t", maxAttempts = 2, baseDelayMs = 1,
        onAlert = _ => alerts += 1) { sys.error("permanent"): Int }
    }
    assert(e.getMessage == "permanent" && alerts == 1)
  }

  test("first-attempt success reports one event and no alert") {
    var alerts = 0
    val events = scala.collection.mutable.ListBuffer.empty[Reliability.Attempt]
    val out = Reliability.withRetry("t", onEvent = events += _,
      onAlert = _ => alerts += 1)(7)
    assert(out == 7 && events.size == 1 && events.head.error.isEmpty && alerts == 0)
  }
}
