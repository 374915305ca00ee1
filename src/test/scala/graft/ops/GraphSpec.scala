package graft.ops

import graft.SparkSpec

/** Fixed-point PageRank contracts: deterministic across partitionings
  * (the point of integer arithmetic), every rank keeps at least the
  * (1-d) teleport floor, and the ranking genuinely differentiates the
  * graph (not a constant vector).
  */
class GraphSpec extends SparkSpec {

  test("pagerank is partition-invariant, floored at the teleport mass, non-constant") {
    val out = Graph.partPagerank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val again = Graph.partPagerank(spark, Sf).repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSet == again.toSet, "integer ranks must not depend on partitioning")
    // every node keeps the teleport floor (0.15, minus integer truncation)
    assert(out.forall(_._3 >= 0.1499999), "teleport floor violated")
    // the co-order graph is not regular: ranks must differentiate
    assert(out.map(_._2).distinct.length > 1, "rank vector is constant")
  }
}
