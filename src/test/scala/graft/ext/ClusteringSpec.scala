package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x140/x144 integer-exact k-means lane: the graded queries must match a
  * plain-Scala reference computation (collected grid vectors, same md5
  * seeding, same floor-div Lloyd rounds, same integer τ test) — the
  * AsofJoinSpec discipline — and keep the broadcast assignment shape.
  */
class ClusteringSpec extends SparkSpec {

  private val K = 8

  /** The spec-side twin of TextAnalysis.tokenHash: first 15 hex chars of
    * md5, as a long.
    */
  private def h15(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def fdiv(a: Long, b: Long): Long = {
    val m = ((a % b) + b) % b
    (a - m) / b
  }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Reference Lloyd (iters=2): (grid rows, final centroids,
    * final assignment vec_id -> (cluster, dist)).
    */
  private def referenceKmeans(keep: Long => Boolean = _ => true): (Array[(Long, Array[Long])],
      Map[Long, Array[Long]], Map[Long, (Long, Long)]) = {
    val rows = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray))
      .filter(t => keep(t._1))
      .sortBy(_._1)
    val seeds = rows.map { case (id, _) => (h15(s"km:$id"), id) }
      .sorted.take(K).map(_._2)
    var cents: Map[Long, Array[Long]] =
      seeds.zipWithIndex.map { case (id, i) =>
        (i + 1L, rows.find(_._1 == id).get._2)
      }.toMap
    def assignAll(): Map[Long, (Long, Long)] = rows.map { case (id, qa) =>
      val best = cents.toSeq.map { case (c, ca) => (d2(qa, ca), c) }.min
      (id, (best._2, best._1))
    }.toMap
    var asg = assignAll()
    cents = asg.groupBy(_._2._1).map { case (c, members) =>
      val qs = members.keys.toSeq.map(id => rows.find(_._1 == id).get._2)
      val n = qs.size.toLong
      (c, Array.tabulate(qs.head.length)(d => fdiv(qs.map(_(d)).sum, n)))
    }
    asg = assignAll()
    (rows, cents, asg)
  }

  test("x140 k-means matches a driver-side reference computation exactly") {
    val (rows, cents, asg) = referenceKmeans()
    val expected = cents.keys.toSeq.sorted.map { c =>
      val members = asg.filter(_._2._1 == c)
      val n = members.size.toLong
      val inertia = members.values.map(_._2).sum
      val rms = if (n == 0) null
        else java.lang.Double.valueOf(math.sqrt(inertia.toDouble / n.toDouble) / 1048576.0)
      (c, n, inertia, rms, cents(c).sum)
    }
    val got = Clustering.kmeansEmbed(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)),
        r.getLong(4)))
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum === rows.length.toLong)
  }

  test("x140 assignment plan broadcasts the centroids — no shuffle-side cartesian") {
    val plan = Clustering.kmeansEmbed(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("x144 SemDeDup prune matches a driver-side reference (integer tau test)") {
    val (rows, cents, asg) = referenceKmeans()
    val byId = rows.toMap
    val n2 = rows.map { case (id, qa) => (id, qa.map(x => x * x).sum) }.toMap
    val tauNum = BigInt(49); val tauDen = BigInt(400)
    val dups = for {
      (ia, (ca, da)) <- asg.toSeq
      (ib, (cb, db)) <- asg.toSeq
      if ib > ia && ca == cb
      dot = byId(ia).zip(byId(ib)).map { case (x, y) => x * y }.sum
      if dot > 0 && tauDen * BigInt(dot) * BigInt(dot) > tauNum * BigInt(n2(ia)) * BigInt(n2(ib))
    } yield (ca, ia, da, ib, db)
    val dropped = dups.map { case (c, ia, da, ib, db) =>
      if (da < db || (da == db && ia < ib)) (c, ib) else (c, ia)
    }.distinct
    val expected = cents.keys.toSeq.sorted.map { c =>
      val nm = asg.count(_._2._1 == c).toLong
      val np = dups.count(_._1 == c).toLong
      val nd = dropped.count(_._1 == c).toLong
      (c, nm, np, nd, nm - nd)
    }
    val got = Clustering.semdedupKmeans(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected)
  }

  test("x141 PQ encode partitions every (vector, subspace) exactly once") {
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    val hist = Clustering.pqCodes(spark, Sf).collect()
    assert(hist.length === 8 * 16) // every (sub, code) slot reported, dead codes included
    assert(hist.map(_.getLong(2)).sum === 8L * n) // one code per vector per subspace
    assert(hist.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 16L))
    assert(hist.forall(r => r.getLong(3) >= 0L))
  }

  test("x145 IVF-PQ probes at most nprobe cells per query and ranks ascending ADC") {
    val df = Clustering.ivfpqTopk(spark, Sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, qs) =>
      val sorted = qs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to qs.length), s"query $q ranks contiguous")
      val dists = sorted.map(_.getLong(4)).toSeq
      assert(dists === dists.sorted, s"query $q ADC order")
      assert(qs.map(_.getLong(3)).distinct.length <= 2, s"query $q candidates outside nprobe=2 cells")
      assert(qs.forall(r => Set(0L, 1L).contains(r.getLong(6))))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("x142 ADC parity emits a full ascending top-k per query and broadcasts the tables") {
    val df = Clustering.pqAdcParity(spark, Sf)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { qs =>
      val sorted = qs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to 10))
      val dists = sorted.map(_.getLong(3)).toSeq
      assert(dists === dists.sorted) // ADC rank order is ascending distance
      assert(qs.forall(r => Set(0L, 1L).contains(r.getLong(5))))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("x148 D4 prune matches a driver-side reference (dedup, then prototype cut)") {
    val (rows, cents, asg) = referenceKmeans()
    val byId = rows.toMap
    val n2 = rows.map { case (id, qa) => (id, qa.map(x => x * x).sum) }.toMap
    val tauNum = BigInt(49); val tauDen = BigInt(400)
    val dups = for {
      (ia, (ca, da)) <- asg.toSeq
      (ib, (cb, db)) <- asg.toSeq
      if ib > ia && ca == cb
      dot = byId(ia).zip(byId(ib)).map { case (x, y) => x * y }.sum
      if dot > 0 && tauDen * BigInt(dot) * BigInt(dot) > tauNum * BigInt(n2(ia)) * BigInt(n2(ib))
    } yield (ca, ia, da, ib, db)
    val dropped = dups.map { case (c, ia, da, ib, db) =>
      if (da < db || (da == db && ia < ib)) (c, ib) else (c, ia)
    }.distinct
    val droppedIds = dropped.map(_._2).toSet
    val expected = cents.keys.toSeq.sorted.map { c =>
      val members = asg.filter(_._2._1 == c).toSeq
      val surv = members.collect {
        case (id, (_, d)) if !droppedIds.contains(id) => (d, id)
      }.sorted
      val nProto = ((1L * surv.size) / 5).toInt
      val kept = surv.drop(nProto).map(_._2)
      (c, members.size.toLong, dropped.count(_._1 == c).toLong,
        nProto.toLong, kept.size.toLong,
        if (kept.isEmpty) null else java.lang.Long.valueOf(kept.sum),
        if (kept.isEmpty) null else java.lang.Long.valueOf(kept.reduce(_ ^ _)))
    }
    val got = Clustering.d4Prune(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5)),
        if (r.isNullAt(6)) null else java.lang.Long.valueOf(r.getLong(6))))
    assert(got.toSeq === expected)
    // D4's two cuts never delete a whole cluster: floor(n/5) < n
    assert(got.forall(r => r._2 == 0L || r._5 >= 1L))
  }

  test("x150 cluster drift matches a frozen-centroid reference and freezes the model") {
    val (baseRows, cents, asgBase) = referenceKmeans(id => id % 5 != 4)
    val arrivals = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray))
      .filter(_._1 % 5 == 4)
    val asgNew = arrivals.map { case (id, qa) =>
      val best = cents.toSeq.map { case (c, ca) => (d2(qa, ca), c) }.min
      (id, (best._2, best._1))
    }.toMap
    val expected = cents.keys.toSeq.sorted.map { c =>
      val bm = asgBase.filter(_._2._1 == c)
      val nm = asgNew.filter(_._2._1 == c)
      (c, bm.size.toLong, bm.values.map(_._2).sum,
        nm.size.toLong, nm.values.map(_._2).sum, cents(c).sum)
    }
    val got = Clustering.clusterDrift(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq === expected)
    // the arrival batch must be non-trivial and fully assigned
    assert(got.map(_._4).sum === arrivals.length.toLong)
    assert(arrivals.nonEmpty)
    // frozen model: base members + centroid checksums equal a pure
    // base-only x140 run (arrivals must not have perturbed training)
    assert(got.map(r => (r._1, r._2)).toMap ===
      cents.keys.map(c => (c, asgBase.count(_._2._1 == c).toLong)).toMap)
  }

  test("x153 recall curve is monotone in nprobe and consistent with the x145 point") {
    val curve = Clustering.ivfpqRecallCurve(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // probing more cells can only add candidates: n_ranked never
    // decreases (a true invariant). n_hits is NOT asserted monotone —
    // a wider probe pool can displace an exact-top-k member from the
    // ADC top-k, so hit monotonicity is fixture-dependent.
    assert(curve.map(_._2).toSeq === curve.map(_._2).sorted.toSeq,
      s"n_ranked must be monotone in nprobe: ${curve.toSeq}")
    curve.foreach { case (p, nRanked, nHits) =>
      assert(nRanked <= 30L, s"nprobe=$p ranked more than numQueries*k")
      assert(nHits <= nRanked)
    }
    // the nprobe=2 curve point must agree with x145's own gate
    val x145Hits = Clustering.ivfpqTopk(spark, Sf).collect()
      .map(_.getAs[Long]("in_exact_topk")).sum
    assert(curve.find(_._1 == 2L).get._3 === x145Hits,
      "curve point 2 must equal the sum of x145's in_exact_topk flags")
  }

  test("x158 warm refresh matches a driver-side reference and conserves the corpus") {
    val (_, cOld, _) = referenceKmeans(id => id % 5 != 4)
    val all = referenceKmeans()._1
    def assignTo(cents: Map[Long, Array[Long]]): Map[Long, (Long, Long)] =
      all.map { case (id, qa) =>
        val best = cents.toSeq.map { case (c, ca) => (d2(qa, ca), c) }.min
        (id, (best._2, best._1))
      }.toMap
    val before = assignTo(cOld)
    val cNew = before.groupBy(_._2._1).map { case (c, members) =>
      val qs = members.keys.toSeq.map(id => all.find(_._1 == id).get._2)
      (c, Array.tabulate(qs.head.length)(d => fdiv(qs.map(_(d)).sum, qs.size.toLong)))
    }
    val after = assignTo(cNew)
    val expected = cOld.keys.toSeq.sorted.map { c =>
      val b = before.filter(_._2._1 == c); val a = after.filter(_._2._1 == c)
      val shift = cNew.get(c).map(nn =>
        java.lang.Long.valueOf(cOld(c).zip(nn).map { case (x, y) => math.abs(x - y) }.sum))
        .orNull
      (c, b.size.toLong, b.values.map(_._2).sum, a.size.toLong, a.values.map(_._2).sum, shift)
    }
    val got = Clustering.centroidRefresh(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5))))
    assert(got.toSeq === expected)
    // conservation: both assignments cover the whole corpus exactly once
    assert(got.map(_._2).sum === all.length.toLong)
    assert(got.map(_._4).sum === all.length.toLong)
  }

  test("x157 reloaded index serves exactly what the fresh model serves") {
    val fresh = Clustering.ivfpqTopk(spark, Sf).collect().map(_.toString).toSeq
    val reloaded = Clustering.ivfpqIndexReload(spark, Sf).collect().map(_.toString).toSeq
    assert(reloaded === fresh, "reload-equals-rebuild violated")
  }

  test("x159 outliers carry the largest per-vector qerr and the exact corpus total") {
    val perVec = Clustering.pqCodes(spark, Sf).collect()
    val corpusTotal = perVec.map(_.getLong(3)).sum
    val rows = Clustering.pqErrorOutliers(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    assert(rows.map(_._1).toSeq === (1 to 20))
    // descending with the vec_id tie-break
    val errs = rows.map(_._3).toSeq
    assert(errs === errs.sorted.reverse)
    assert(rows.forall(_._4 == corpusTotal),
      "corpus_qerr must equal the x141 histogram's total qerr")
    assert(errs.head > 0L)
  }

  test("x189 k-center equals the driver-side greedy farthest-point reference") {
    val q = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray).toMap
    // reference: same md5 seed, same greedy loop, same (dm desc, id) ties
    val seed = q.keys.toSeq.minBy(id => (h15(s"kc:$id"), id))
    var dm = q.map { case (id, v) => id -> d2(v, q(seed)) }
    var centers = Vector((seed, -1L)) // sel dist unused for the seed
    (2 to 8).foreach { _ =>
      val c = dm.toSeq.maxBy { case (id, d) => (d, -id) }._1
      centers :+= ((c, dm(c)))
      dm = dm.map { case (id, d) => id -> math.min(d, d2(q(id), q(c))) }
    }
    val cov = dm.values.max
    val rows = Clustering.kcenterCoreset(spark, Sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.length === 8)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) === centers(i)._1, s"center at round ${i + 1}")
      if (i > 0) assert(r.getLong(2) === centers(i)._2, s"sel dist round ${i + 1}")
      assert(r.getLong(4) === cov, "covering radius")
    }
    // farthest-point selection distances are non-increasing
    val sels = rows.drop(1).map(_.getLong(2)).toSeq
    assert(sels === sels.sorted.reverse)
  }

  test("x144/x148 cluster count scales with n, pinned at base through the graded decades") {
    // n=500 here; the default 512-target keeps the base k=8 all the way
    // to n=4096 (both graded scales included), then grows ∝ n
    assert(Clustering.scaledK(spark, Sf) === 8)
    assert(Clustering.scaledK(spark, Sf, base = 8, targetClusterSize = 10L) === 50)
    assert(Clustering.scaledK(spark, Sf, base = 8, targetClusterSize = 62L) === 9) // ceil
    assert(Clustering.scaledK(spark, Sf, base = 8, targetClusterSize = 500L) === 8)
    // a scaled (non-base) k still partitions the corpus exactly: cluster
    // member counts sum to n and the prune accounting stays consistent
    val k10 = Clustering.scaledK(spark, Sf, base = 8, targetClusterSize = 50L)
    assert(k10 === 10)
    val rows = Clustering.semdedupKmeans(spark, Sf, k = k10).collect()
    assert(rows.map(_.getLong(1)).sum === 500L, "n_members must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(3) === r.getLong(4), s"kept = members - dropped: $r")
    }
  }

  test("collapsed dup/drops equal the doc-grain spelling on a planted-clone assignment") {
    // hand-built lloyd assignment covering every expansion branch:
    // cluster 0 — content A x3 (dist 4) and B x2 (dist 4, parallel to A:
    // the τ test passes and the dists TIE), C x1 orthogonal-ish (dot 0);
    // cluster 1 — D x2 (self-pair only, E fails the dot>0 gate);
    // cluster 2 — two ZERO vectors (n2=0: never a dup, even as clones).
    import spark.implicits._
    val qA = Seq(3L, 4L); val qB = Seq(6L, 8L); val qC = Seq(-4L, 3L)
    val qD = Seq(1L, 0L); val qE = Seq(0L, 1L); val qZ = Seq(0L, 0L)
    def n2(q: Seq[Long]) = q.map(x => x * x).sum
    val asg = Seq(
      (0L, 1L, qA, 4L), (0L, 5L, qA, 4L), (0L, 9L, qA, 4L),
      (0L, 2L, qB, 4L), (0L, 3L, qB, 4L), (0L, 7L, qC, 2L),
      (1L, 10L, qD, 3L), (1L, 11L, qD, 3L), (1L, 12L, qE, 9L),
      (2L, 20L, qZ, 0L), (2L, 21L, qZ, 0L))
      .map { case (c, id, q, d) => (c, id, q, d, n2(q)) }
      .toDF("cluster", "vec_id", "qa", "dist", "n2")
    val (gotCounts, gotDrops) = Clustering.dupDrops(asg, 49L, 400L)
    val (refPairs, refDrops) = Clustering.dupDropsDoc(asg, 49L, 400L)
    val counts = gotCounts.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refCounts = refPairs.groupBy(col("cluster"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === refCounts)
    // hand expectations: cluster 0 = A x B (6) + C(3,2) (3) + C(2,2) (1),
    // cluster 1 = D's self pair, cluster 2 absent (zero vectors)
    assert(counts === Map(0L -> 10L, 1L -> 1L))
    val drops = gotDrops.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refD = refDrops.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drops === refD)
    // the tie branch: A x B drops {z in A: z > min B} u {z in B: z > min A}
    // = {5,9,2,3}; self drops add nothing new; D's self drops 11
    assert(drops === Set((0L, 2L), (0L, 3L), (0L, 5L), (0L, 9L), (1L, 11L)))
  }

  test("native argmin assignment equals the broadcast-join reference, ties to min id") {
    import spark.implicits._
    val pts = Clustering.qvecs(spark, Sf)
    // a real (non-contiguous-id after recompute is also covered: drop one)
    val cents = Clustering.seedCentroidsOf(pts, 10)
      .filter(org.apache.spark.sql.functions.col("cluster") =!= 4L)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cluster", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = snap(Clustering.assign(pts, cents))
    val fast = snap(Clustering.assignFast(pts, cents))
    assert(fast === ref, "kernel assignment must equal the min-of-struct reference")
    // planted tie: two IDENTICAL centroids — both paths must pick the
    // smaller cluster id for every point
    val c0 = cents.limit(1).collect()(0).getSeq[Long](1)
    val tied = Seq((7L, c0), (3L, c0)).toDF("cluster", "ca")
    val refT = snap(Clustering.assign(pts, tied))
    val fastT = snap(Clustering.assignFast(pts, tied))
    assert(fastT === refT)
    assert(fastT.forall(_._2 == 3L), "ties must resolve to the smallest cluster id")
  }
}
