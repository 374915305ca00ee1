package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-complexity and convergence contract of the CC engine behind
  * x47/x57/x61/x84/x217 (min-label propagation WITH the label-of-label
  * doubling hop): O(log diameter) rounds on ANY topology — pinned on
  * the adversarial case, a pure path graph, where plain min-label
  * propagation needs O(n) rounds and silently returns un-converged
  * labels past the cap. Also pins that non-convergence is LOUD: the
  * engine must throw at the cap, never hand back wrong labels.
  */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("a 1000-node chain converges in O(log n) rounds, correctly") {
    val n = 1000
    val pairs = (1 until n).map(i => (i.toLong, i.toLong + 1L))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs, maxIters = 50)
    // doubling: the min label travels 2^k hops by round k — 1000 nodes
    // need ~log2(1000)+2 ≈ 12 rounds plus the convergence-detect round;
    // 20 = 2*ceil(log2 1001) is a loose certificate that the hop is live
    // (plain propagation would need 999)
    assert(rounds <= 20, s"pointer doubling must bound rounds (got $rounds)")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === n)
    assert(got.values.toSet === Set(1L),
      "every chain node must converge to the component minimum")
  }

  test("two components + a chain: labels are per-component minima") {
    val pairs = ((1 until 500).map(i => (i.toLong, i.toLong + 1L)) ++
      Seq((2000L, 2001L), (2001L, 2002L), (2000L, 2002L)))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs, maxIters = 50)
    assert(rounds <= 20)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1 to 500).forall(i => got(i.toLong) == 1L))
    assert(Seq(2000L, 2001L, 2002L).forall(got(_) == 2000L))
  }

  test("non-convergence at the cap is loud, not silent wrong labels") {
    val pairs = (1 until 64).map(i => (i.toLong, i.toLong + 1L))
      .toDF("doc_a", "doc_b")
    val boom = intercept[IllegalStateException] {
      Dedup.connectedComponentsWithRounds(pairs, maxIters = 2)
    }
    assert(boom.getMessage.contains("converge"),
      s"the failure must name the problem, got: ${boom.getMessage}")
  }
}
