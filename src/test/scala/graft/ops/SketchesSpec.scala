package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error-bound contracts for the sketch aggregates. The q29/q50 driver
  * queries hash-gate their exact legs and reduce the estimates to
  * bound-check booleans; this spec keeps the RAW error measurement (the
  * flags say "within bound", these tests say how close) plus the
  * lossless-merge property of the HLL partials.
  */
class SketchesSpec extends SparkSpec {

  test("q29/q50 bound-check flags are all true") {
    val q29 = Sketches.eventSketches(spark, Sf).collect()
    assert(q29.nonEmpty)
    q29.foreach { r =>
      assert(r.getAs[Boolean]("n_users_approx_ok"), s"${r.getString(0)}: HLL++ out of bound")
      assert(r.getAs[Boolean]("p50_approx_ok"), s"${r.getString(0)}: approx median out of bound")
    }
    val q50 = Sketches.hllDailyMerge(spark, Sf).collect()
    assert(q50.nonEmpty)
    q50.foreach { r =>
      assert(r.getAs[Boolean]("day_est_ok"), s"day ${r.get(0)}: daily HLL out of bound")
      assert(r.getAs[Boolean]("total_est_ok"), "merged HLL total out of bound")
    }
  }

  test("raw approx distinct and approx median track exact within bounds") {
    val raw = graft.engine.Tables(spark, Sf, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile_approx(value, 0.5, 10000)").as("p50a"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx $approx vs exact $exact")
      val p50 = r.getAs[Double]("p50")
      val p90 = r.getAs[Double]("p90")
      val p50a = r.getAs[Double]("p50a")
      assert(p50 <= p90, "exact percentiles must be ordered")
      // with accuracy 10000 on these group sizes the approx median is exact
      assert(math.abs(p50a - p50) <= math.max(1e-9, (p90 - p50) * 0.1),
        s"${r.getString(0)}: approx median $p50a vs exact $p50")
    }
  }

  test("count-min estimates never undercount and stay within eps * N") {
    val hh = Sketches.tokenHeavyHitters(spark, Sf).collect()
    assert(hh.nonEmpty)
    val totalTokens = graft.engine.Tables(spark, Sf, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")))
      .count()
    hh.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getLong(2)
      assert(est >= exact, s"'${r.getString(0)}': CMS undercounted $est < $exact")
      assert(est <= exact + (0.001 * totalTokens).ceil.toLong + 1,
        s"'${r.getString(0)}': CMS estimate $est beyond the eps bound over $exact")
    }
  }

  test("union of daily HLL partials equals the one-shot sketch and tracks exact") {
    val ev = graft.engine.Tables(spark, Sf, "events")
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact"))
    // per-day estimates track the per-day exact counts (daily cardinalities
    // are small enough that the sketch is near-exact there)
    daily.select(col("day"), hll_sketch_estimate(col("sk")).as("est"), col("exact"))
      .collect().foreach { r =>
        val exact = r.getAs[Long]("exact").toDouble
        val est = r.getAs[Long]("est").toDouble
        assert(math.abs(est - exact) / exact <= 0.05,
          s"day ${r.get(0)}: daily HLL estimate $est vs exact $exact")
      }
    // the merged estimate from partials is EXACTLY the one-shot sketch's —
    // the lossless-merge property incremental maintenance relies on
    val oneShot = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .head().getAs[Long]("est")
    val fromPartials = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getAs[Long]("est")
    assert(fromPartials === oneShot,
      s"union-of-partials $fromPartials != one-shot sketch $oneShot")
    // and it tracks the exact overall distinct within HLL error
    val exactTotal = ev.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(fromPartials - exactTotal) / exactTotal <= 0.05,
      s"merged estimate $fromPartials vs exact $exactTotal")
  }

  test("q81 CMS join-cardinality estimate matches a driver-side reference and never underestimates") {
    def h15(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val ok = spark.read.parquet(s"$Sf/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val lk = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    def sketch(keys: Array[Long]): Map[(Int, Long), Long] =
      keys.flatMap(k => (0 until 3).map(i => (i, h15(s"cms:$i:$k") % 256L)))
        .groupBy(identity).map { case (b, hits) => (b, hits.length.toLong) }
    val sa = sketch(ok); val sb = sketch(lk)
    val estI = (0 until 3).map { i =>
      sa.collect { case ((j, b), c) if j == i =>
        c * sb.getOrElse((i, b), 0L)
      }.sum
    }
    val cntA = ok.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val exact = lk.map(k => cntA.getOrElse(k, 0L)).sum
    val expected = (0 until 3).map(i => (i, estI(i), estI.min, exact, estI(i) >= exact))
    val got = Sketches.joinCardEst(spark, Sf).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === expected)
    // the one-sided CMS guarantee, asserted independently of the flag
    assert(estI.forall(_ >= exact))
  }

  test("x175: daily q-digest merge answers inside the ±5%-rank windows") {
    val rows = Sketches.qdigestDaily(spark, Sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.50, 0.90, 0.99))
    rows.foreach { r =>
      assert(r.getBoolean(5), s"q=${r.getDouble(0)}: digest estimate out of window")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        "exact legs must be ordered lo <= value <= hi")
    }
    val n = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(rows.forall(_.getLong(1) === n))
  }

  test("KLL: exact below capacity, weight-conserving, byte-stable, bounded under compaction") {
    import graft.functions.KllSketch
    // no compaction: the sketch IS the sorted stream — quantiles exact
    val small = (1L to 400L).foldLeft(KllSketch.empty(k = 512))(_.insert(_))
    assert(small.n === 400L && small.compactions === 0L)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(small.quantile(q) === math.ceil(q * 400).toLong)
    // serialization round-trips the whole structure
    val back = KllSketch.fromBytes(small.toBytes)
    assert(back === small)
    // deterministic: same stream → byte-identical sketch
    val again = (1L to 400L).foldLeft(KllSketch.empty(k = 512))(_.insert(_))
    assert(again.toBytes.toSeq === small.toBytes.toSeq)
    // heavy compaction: weight conserved exactly, rank error inside the
    // gate window's 5% with a wide margin (k=512 ⇒ ~1% here)
    val n = 100000L
    val big = (1L to n).foldLeft(KllSketch.empty(k = 512))(_.insert(_))
    assert(big.compactions > 0L)
    assert(big.weightedCount === n)
    for (q <- Seq(0.50, 0.90, 0.99)) {
      val est = big.quantile(q)
      val err = math.abs(est - q * n) / n.toDouble
      assert(err < 0.02, s"q=$q est=$est rank error $err")
    }
  }

  test("KLL: merge conserves weight and any grouping of partials stays in the error window") {
    import graft.functions.KllSketch
    val n = 60000L
    // a shuffled-but-deterministic stream (multiplicative hop mod prime)
    val stream = (1L to n).map(i => (i * 48271L) % 65537L)
    val chunks = stream.grouped(5000).toSeq
      .map(_.foldLeft(KllSketch.empty(k = 512))(_.insert(_)))
    // two different merge trees over the same partials
    val leftFold = chunks.reduceLeft(_.merge(_))
    val pairwise = chunks.grouped(2).map(_.reduceLeft(_.merge(_))).toSeq
      .reduceLeft(_.merge(_))
    val sortedStream = stream.sorted
    for (sk <- Seq(leftFold, pairwise)) {
      assert(sk.n === n)
      assert(sk.weightedCount === n)
      for (q <- Seq(0.50, 0.90, 0.99)) {
        val est = sk.quantile(q)
        val exactRank = sortedStream.count(_ <= est).toDouble / n
        assert(math.abs(exactRank - q) < 0.02,
          s"q=$q est=$est landed at rank $exactRank")
      }
    }
  }

  test("x222: daily KLL merge and the whole-stream build answer inside the ±5%-rank windows") {
    val rows = Sketches.kllDaily(spark, Sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.50, 0.90, 0.99))
    rows.foreach { r =>
      assert(r.getBoolean(5), s"q=${r.getDouble(0)}: merged-partial estimate out of window")
      assert(r.getBoolean(6), s"q=${r.getDouble(0)}: whole-build estimate out of window")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        "exact legs must be ordered lo <= value <= hi")
    }
    val n = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(rows.forall(_.getLong(1) === n))
  }

  test("x171: KMV pair algebra degrades to exact when k covers the union") {
    import spark.implicits._
    // A = {1..1000}, B = {501..1500}: union 1500, intersection 500
    val el = ((1L to 1000L).map(("a", _)) ++ (501L to 1500L).map(("b", _)))
      .toDF("source", "h")
    val row = Sketches.bottomkPairs(el, k = 2048).collect().head
    assert(row.getAs[Long]("n_a") === 1000L)
    assert(row.getAs[Long]("n_b") === 1000L)
    assert(row.getAs[Long]("exact_union") === 1500L)
    assert(row.getAs[Long]("exact_intersection") === 500L)
    // union sketch < k → the sketch IS the set: estimates are exact
    assert(row.getAs[Long]("n_union_sketch") === 1500L)
    assert(row.getAs[Double]("est_union") === 1500.0)
    assert(row.getAs[Long]("rho") === 500L)
    assert(row.getAs[Double]("est_jaccard") === 500.0 / 1500.0)
    assert(row.getAs[Double]("est_intersection") === (500.0 / 1500.0) * 1500.0)
  }

  test("x171: KMV estimates track planted truth under the real 60-bit hash") {
    import spark.implicits._
    // uniform hashes via tokenHash: A = e1..e2000, B = e1001..e3000
    val el = ((1 to 2000).map(i => ("a", s"e$i")) ++
      (1001 to 3000).map(i => ("b", s"e$i"))).toDF("source", "g")
      .select(col("source"), graft.ext.TextAnalysis.tokenHash(col("g")).as("h"))
    val row = Sketches.bottomkPairs(el, k = 256).collect().head
    assert(row.getAs[Long]("exact_union") === 3000L)
    assert(row.getAs[Long]("exact_intersection") === 1000L)
    assert(row.getAs[Long]("n_union_sketch") === 256L)
    assert(row.getAs[Long]("rho") <= 256L)
    val estU = row.getAs[Double]("est_union")
    assert(math.abs(estU - 3000.0) / 3000.0 < 0.35,
      s"KMV union estimate $estU too far from 3000 (k=256 ⇒ σ≈6%)")
    val estJ = row.getAs[Double]("est_jaccard")
    assert(math.abs(estJ - 1.0 / 3.0) < 0.15, s"jaccard estimate $estJ vs 1/3")
    // the corpus query end-to-end: every row's invariants hold
    val corpus = Sketches.bottomkOverlap(spark, Sf, numSources = 6, k = 64).collect()
    assert(corpus.length === 15, "6 sources → 15 ordered pairs")
    corpus.foreach { r =>
      assert(r.getAs[Long]("rho") <= r.getAs[Long]("n_union_sketch"))
      assert(r.getAs[Long]("exact_intersection") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      // exact branch or hash branch, the estimator must stay sane
      assert(r.getAs[Double]("est_union") > 0.0)
    }
  }
  test("x206 histogram estimate equals the driver reference; PK-FK joins estimate exactly") {
    import org.apache.spark.sql.functions.col
    val a = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey")).collect().map(_.getLong(0))
    val b = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val (lo, hi) = ((a ++ b).min, (a ++ b).max)
    def bkt(k: Long): Long =
      math.floor((k - lo).toDouble * 16 / (hi - lo + 1).toDouble).toLong
    val na = a.groupBy(bkt).map { case (x, g) => x -> g.length.toLong }
    val va = a.distinct.groupBy(bkt).map { case (x, g) => x -> g.length.toLong }
    val nb = b.groupBy(bkt).map { case (x, g) => x -> g.length.toLong }
    val vb = b.distinct.groupBy(bkt).map { case (x, g) => x -> g.length.toLong }
    val rows = Sketches.histJoinEst(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    rows.foreach { case (bk, gna, gnb, gva, gvb, contrib, _, _) =>
      assert(gna === na(bk)); assert(gnb === nb(bk))
      assert(gva === va(bk)); assert(gvb === vb(bk))
      assert(contrib === gna.toDouble * gnb / math.max(gva, gvb))
    }
    // orders -> customer is a PK-FK join whose keys cover every bucket:
    // per bucket ndvb == nb (customer keys unique), so the histogram
    // estimate collapses to sum(na) = |orders| = the exact answer
    val (est, exact) = (rows.head._7, rows.head._8)
    assert(math.abs(est - exact.toDouble) < 1e-6,
      s"PK-FK histogram estimate must be exact: $est vs $exact")
  }

  test("x212 equi-depth buckets hold ~ndv/B distinct keys each and the estimate stays exact on PK-FK") {
    import org.apache.spark.sql.functions.col
    val rows = Sketches.histEquiDepthEst(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length === 16)
    // equi-DEPTH property: every bucket carries ndva within 1 of ndv/B
    // (the defining invariant equi-width cannot give under skew)
    val ndv = rows.map(_._4).sum
    rows.foreach { case (bk, _, _, ndva, _, _, _) =>
      assert(math.abs(ndva - ndv / 16.0) <= 1.0,
        s"bucket $bk holds $ndva distinct keys, expected ~${ndv / 16.0}")
    }
    // PK-FK exactness holds here too: customer keys are unique per
    // bucket, so the estimate collapses to |orders ⋈ customer| exactly
    val exact = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey")).count()
    assert(math.abs(rows.head._7 - exact.toDouble) < 1e-6,
      s"PK-FK equi-depth estimate must be exact: ${rows.head._7} vs $exact")
  }

  test("x215 sample estimates track exact; correlated sampling dominates independent on the FK join") {
    import org.apache.spark.sql.functions.col
    val r = Sketches.sampleJoinEst(spark, Sf).head()
    val (estInd, estCor) = (r.getAs[Double]("est_independent"),
      r.getAs[Double]("est_correlated"))
    val exact = spark.read.parquet(s"$Sf/orders.parquet").select(col("o_orderkey"))
      .join(spark.read.parquet(s"$Sf/lineitem.parquet").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey")).count()
    def relErr(e: Double) = math.abs(e - exact) / exact
    // correlated sampling keys both coins on the join key: sampled keys
    // carry their COMPLETE match lists, so only key-population variance
    // remains — on a uniform FK join it must land within ~15%
    assert(relErr(estCor) < 0.15,
      s"correlated: $estCor vs exact $exact (${relErr(estCor)})")
    // independent sampling thins pairs to p^2 — the estimate is unbiased
    // but visibly noisier; accept a wide band, require the ordering
    assert(relErr(estInd) < 0.8,
      s"independent: $estInd vs exact $exact (${relErr(estInd)})")
    assert(relErr(estCor) <= relErr(estInd),
      "the correlated estimator must not be worse on the FK join")
  }
}
