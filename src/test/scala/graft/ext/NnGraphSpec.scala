package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x187/x188 NN-descent lane: the graph must satisfy the algorithm's
  * structural invariants (per-node degree ≤ k, ranks contiguous,
  * distances sorted and exact on the grid), per-node k-th distance must
  * be monotone non-increasing in rounds (guaranteed because round r's
  * candidate set includes round r-1's edges), and the x188 recall
  * number must equal a driver-side brute-force recomputation.
  */
class NnGraphSpec extends SparkSpec {

  private val K = 6

  private def h15(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def grid(spark: org.apache.spark.sql.SparkSession): Map[Long, Array[Long]] =
    spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray).toMap

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("x187 graph: degree, rank contiguity, sorted exact grid distances") {
    val q = grid(spark)
    val rows = NnGraph.nnDescent(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.length <= K, s"node $src has ${sorted.length} edges")
      assert(sorted.map(_._2).toSeq === (1 to sorted.length), s"ranks of $src")
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq,
        s"distances of $src not sorted by rank")
      sorted.foreach { case (_, _, nbr, d) =>
        assert(nbr !== src)
        assert(d === d2(q(src), q(nbr)), s"grid distance of ($src,$nbr)")
      }
    }
  }

  test("x187 descent is monotone: per-node k-th distance never regresses") {
    def kth(rounds: Int): Map[Long, Long] =
      NnGraph.nnEdges(spark, Sf, K, rounds, 32)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2).max }
    val r1 = kth(1); val r2 = kth(2); val r4 = kth(4)
    r4.keys.foreach { s =>
      assert(r2(s) <= r1(s), s"round 2 regressed node $s")
      assert(r4(s) <= r2(s), s"round 4 regressed node $s")
    }
  }

  test("x188 recall matches a driver-side brute-force recomputation") {
    val q = grid(spark)
    val row = NnGraph.nnDescentRecall(spark, Sf).collect()(0)
    val (nq, hits, possible, recall) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val probes = q.keys.toSeq
      .sortBy(id => (h15(s"nndq:$id"), id)).take(64)
    val truth = probes.flatMap { s =>
      q.keys.filter(_ != s).toSeq
        .map(t => (t, d2(q(s), q(t)))).sortBy { case (t, d) => (d, t) }
        .take(K).map { case (t, _) => (s, t) }
    }.toSet
    val graph = NnGraph.nnEdges(spark, Sf, K, 4, 32).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refHits = truth.count(graph.contains)
    assert(nq === 64L)
    assert(possible === truth.size.toLong)
    assert(hits === refHits.toLong)
    assert(recall === refHits.toDouble / truth.size)
    // better than 10x the random baseline k/(n-1) on this fixture
    assert(recall > 10.0 * K / (q.size - 1))
  }

  test("x192 prune verdicts equal the driver-side domination test") {
    val q = grid(spark)
    val edges = NnGraph.nnEdges(spark, Sf, K, 4, 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySrc = edges.groupBy(_._1)
    val rows = NnGraph.rngPrune(spark, Sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getBoolean(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(rows.size === edges.length)
    var prunedCount = 0
    bySrc.foreach { case (src, es) =>
      es.foreach { case (_, v, dv) =>
        val dominated = es.exists { case (_, w, dw) =>
          (dw < dv || (dw == dv && w < v)) && d2(q(w), q(v)) < dv
        }
        val (kept, _) = rows((src, v))
        assert(kept === !dominated, s"verdict for ($src,$v)")
        if (dominated) prunedCount += 1
      }
      // surviving ranks are contiguous from 1 and the nearest edge survives
      val keptRanks = es.filter(e => rows((src, e._2))._1)
        .map(e => rows((src, e._2))._2).sorted.toSeq
      assert(keptRanks === (1L to keptRanks.length).toSeq)
      val nearest = es.minBy { case (_, v, d) => (d, v) }
      assert(rows((src, nearest._2))._1, s"rank-1 edge of $src must survive")
    }
    assert(prunedCount > 0, "fixture should exercise the prune path")
  }

  test("x195 beam search equals a driver-side walk of the pruned graph") {
    val q = grid(spark)
    val standing = q.keys.filter(id => ((id % 10) + 10) % 10 != 9).toSet
    val arrivals = q.keys.filterNot(standing).toSeq.sorted
    // kept standing edges, recomputed from x192 semantics on the
    // standing-tag graph
    val es = NnGraph.nnEdges(spark, Sf, 6, 4, 32, "standing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySrc = es.groupBy(_._1)
    val kept = es.filter { case (src, v, dv) =>
      !bySrc(src).exists { case (_, w, dw) =>
        (dw < dv || (dw == dv && w < v)) && d2(q(w), q(v)) < dv
      }
    }.groupBy(_._1).map { case (s, e) => s -> e.map(_._2).toSeq }
    val entry = standing.toSeq.minBy(id => (h15(s"gse:$id"), id))
    val (beam, hops, k) = (8, 4, 6)
    val truth = arrivals.flatMap { a =>
      var frontier = Seq(entry)
      (1 to hops).foreach { _ =>
        val cand = (frontier ++ frontier.flatMap(n => kept.getOrElse(n, Nil)))
          .distinct
        frontier = cand.map(n => (n, d2(q(a), q(n))))
          .sortBy { case (n, d) => (d, n) }.take(beam).map(_._1)
      }
      frontier.map(n => (n, d2(q(a), q(n))))
        .sortBy { case (n, d) => (d, n) }.take(k)
        .zipWithIndex.map { case ((n, d), i) => (a, i + 1, n, d) }
    }.toSet
    val got = NnGraph.beamSearch(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === truth)
    // the walk actually descends: every query's best is at least as
    // close as the shared entry point
    arrivals.foreach { a =>
      val best = got.filter(e => e._1 == a && e._2 == 1).head._4
      assert(best <= d2(q(a), q(entry)), s"query $a did not descend")
    }
  }
}
