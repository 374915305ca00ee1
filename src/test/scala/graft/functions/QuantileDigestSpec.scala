package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** q-digest contract: the ε rank-error theorem on adversarial and
  * uniform data, size bounds, byte round-trip, and merge grouping
  * invariance of the BOUND (not the tree).
  */
class QuantileDigestSpec extends AnyFunSuite {

  private def rankErr(sorted: IndexedSeq[Long], q: Double, est: Long): Double = {
    val n = sorted.length
    val target = math.max(1L, math.ceil(q * n).toLong)
    // the est value's achievable rank window in the sorted data
    val lo = sorted.indexWhere(_ >= est) match { case -1 => n case i => i + 1 }
    val hi = sorted.lastIndexWhere(_ <= est) match { case -1 => 0 case i => i + 1 }
    if (target < lo) (lo - target).toDouble / n
    else if (target > hi) (target - hi).toDouble / n
    else 0.0
  }

  private def buildStream(vs: Seq[Long], bits: Int = 17, sigma: Int = 2000): QDigest = {
    var d = QDigest.empty(bits, sigma)
    var pending = 0
    vs.foreach { v =>
      d = d.insert(v); pending += 1
      if (pending >= 4096) { d = d.compress; pending = 0 }
    }
    d.compress
  }

  test("quantile reads stay inside the bits*n/sigma rank-error bound") {
    val eps = 17.0 / 2000.0
    // skewed: 80% small values, a heavy tail
    val vs = ((1 to 8000).map(i => (i % 97).toLong) ++
      (1 to 2000).map(i => 1000L + (i * 37 % 5000))).toIndexedSeq
    val sorted = vs.sorted
    val d = buildStream(vs)
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
      val e = rankErr(sorted, q, d.quantile(q))
      assert(e <= eps, s"q=$q rank error $e exceeds theorem bound $eps")
    }
  }

  test("summary size is bounded and far below the data size") {
    val vs = (1 to 50000).map(i => (i * 2654435761L) % 100000)
    val d = buildStream(vs)
    // q-digest size bound: O(sigma * bits) nodes; empirically far less
    assert(d.counts.size <= 2000 * 17)
    assert(d.counts.size < 8000, s"summary holds ${d.counts.size} nodes for 50k values")
    assert(d.n === 50000L)
  }

  test("byte round-trip is exact and merge is count addition") {
    val a = buildStream((1 to 3000).map(_.toLong))
    val b = buildStream((3001 to 5000).map(_.toLong))
    val rt = QDigest.fromBytes(a.toBytes)
    assert(rt === a)
    val m = a.add(b)
    assert(m.n === 5000L)
    assert(m.counts.values.sum === 5000L)
    // commutativity, bitwise
    assert(b.add(a) === m)
  }

  test("merged partials answer within the bound regardless of grouping") {
    val eps = 2 * 17.0 / 2000.0 // merged digests: the slacks of both halves
    val vs = (1 to 20000).map(i => (i * 48271L) % 65536)
    val sorted = vs.sorted.toIndexedSeq
    val parts = vs.grouped(3000).map(buildStream(_)).toSeq
    val left = parts.reduceLeft((x, y) => x.add(y)).compress
    val right = parts.reduceRight((x, y) => x.add(y)).compress
    Seq(0.5, 0.9, 0.99).foreach { q =>
      assert(rankErr(sorted, q, left.quantile(q)) <= eps)
      assert(rankErr(sorted, q, right.quantile(q)) <= eps)
    }
    // pure addition makes grouping irrelevant BITWISE before compress
    assert(left === right)
  }

  test("out-of-range values saturate at the domain boundary") {
    val d = QDigest.empty(bits = 8, sigma = 100)
      .insert(-5L).insert(300L).insert(10L)
    assert(d.n === 3L)
    assert(d.quantile(0.01) === 0L)
    assert(d.quantile(0.99) === 255L)
  }
}
