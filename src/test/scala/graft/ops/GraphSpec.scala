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

  test("bfs hops: exactly one source at 0, neighbor consistency, horizon sentinel") {
    import org.apache.spark.sql.functions.col
    val hops = Graph.bfsHops(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hops.values.count(_ == 0L) == 1, "exactly one hub at distance 0")
    assert(hops.values.forall(d => d <= 4L || d == 999L),
      "within the 4-hop horizon or the sentinel")
    // triangle property along every edge: distances differ by at most 1
    // (sentinel pairs excluded — both beyond the horizon is consistent)
    val lineitem = graft.engine.Tables(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = lineitem.as("a").join(lineitem.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey"), col("b.l_partkey"))
      .count().filter(col("count") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (u, v) =>
      val (du, dv) = (hops(u), hops(v))
      if (du != 999L && dv != 999L)
        assert(math.abs(du - dv) <= 1L, s"edge ($u,$v): |$du - $dv| > 1")
      else if (du == 999L ^ dv == 999L)
        assert(math.min(du, dv) >= 4L,
          s"edge ($u,$v): a node adjacent to a reached node under the horizon cannot be unreached")
    }
  }

  test("label propagation: labels are node ids, sizes consistent, partition-invariant") {
    val out = Graph.labelPropagation(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val nodes = out.map(_._1).toSet
    assert(out.map(_._2).forall(nodes.contains), "every community label IS a member node id")
    out.groupBy(_._2).foreach { case (lbl, rows) =>
      assert(rows.forall(_._3 == rows.length.toLong),
        s"community $lbl: reported size must equal the actual member count")
    }
    val again = Graph.labelPropagation(spark, Sf).repartition(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out.toSet, "min-tie-break LPA must not depend on partitioning")
  }

  test("triangle counts and clustering match a hand-built graph") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_tri").toString
    // two {1,2,3} orders (triangle, every pair support 2) + two {1,4}
    // orders (pendant edge): node 1 bridges a clique and a spoke
    val rows = Seq(
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 1L), (103L, 4L),
      (104L, 1L), (104L, 4L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Graph.triangleCounts(spark, tmp)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 1L, 2.0 / 6.0)), s"hub node: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1.0)) && got(3L) == ((2L, 1L, 1.0)),
      "clique-only nodes have coefficient 1")
    assert(got(4L) == ((1L, 0L, 0.0)), "pendant node: no triangle, degree 1")
  }

  test("basket cap bounds a synthetic mega-order and the drop audit names it") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_megaorder").toString
    // one pathological 200-part order + two normal baskets sharing parts 1/2
    val rows = (1L to 200L).map(p => (9999L, p)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val capped = Graph.cappedItems(spark, tmp, 50)
    val mega = capped.filter(col("l_orderkey") === 9999L)
      .select(col("l_partkey")).collect().map(_.getLong(0)).toSet
    assert(mega.size == 50, s"mega order must be capped at 50, got ${mega.size}")
    // the cap keeps the globally most frequent parts: 1 and 2 occur in
    // three orders each, every other part only in the mega order
    assert(mega.contains(1L) && mega.contains(2L),
      "frequency-ranked cap must keep the corpus-hot parts")
    assert(capped.filter(col("l_orderkey") === 1L).count() == 2L,
      "small baskets must pass through untruncated")
    val drops = Graph.basketDrops(spark, tmp, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(drops == Seq((9999L, 200L, 150L)),
      s"drop audit must report exactly the truncated order, got $drops")
  }

  test("x184: peeling finds the planted 3-core and cascades removals") {
    import spark.implicits._
    // K4 on {1,2,3,4} (a true 3-core) + a tail 4-5-6: 5 has degree 2
    // (drops round 1), after which 6 is isolated... 6's only neighbor
    // is 5, degree 1 -> round 1; then 4 still has K4 degree 3 -> stays
    val undirected = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    val got = Graph.peel(edges, k = 3, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getInt(2))).toMap
    assert(got(1L) === ((true, 0)) && got(2L) === ((true, 0)) &&
      got(3L) === ((true, 0)))
    // node 4 has degree 4 initially; after 5 drops it keeps the K4 core
    assert(got(4L) === ((true, 0)))
    assert(got(5L) === ((false, 1)), "degree-2 tail node drops in round 1")
    assert(got(6L) === ((false, 1)), "degree-1 leaf drops in round 1")
  }
}
