package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the retrieval + mixture-design lanes (x123-x127): BM25
  * against an independently-computed brute-force reference, RRF score
  * reconstruction, the DSIR expectation invariant, TV-distance bounds and
  * a hand-rolled pair check, and exact fixed-point moment equality.
  */
class RetrievalSpec extends SparkSpec {

  test("x223: cross-encoder rerank permutes the MMR pool; stub and batching are deterministic") {
    // the trim/split parity edges the stub documents (the QualityCounts
    // lesson): trailing newline and leading tab produce EMPTY tokens
    assert(Retrieval.CrossEncoder.score("hello world\n", "hello world") ===
      ((2L, 3L, 2.0 / 3.0)))
    assert(Retrieval.CrossEncoder.score("\tx", "x") === ((1L, 2L, 0.5)))
    assert(Retrieval.CrossEncoder.score("  x  ", "x") === ((1L, 1L, 1.0)))
    val ce = Retrieval.crossEncoderRerank(spark, Sf).collect()
    // rerank is a permutation of the x129 selection, never a re-retrieval
    val mmr = Retrieval.mmrRerank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ce.map(r => (r.getLong(0), r.getLong(2))).toSet === mmr)
    // per query: ce_rank covers 1..k in (score desc, doc_id) order
    ce.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.length))
      val key = sorted.map(r => (-r.getDouble(6), r.getLong(2)))
      assert(key.sorted.toSeq === key.toSeq)
    }
    // scores equal a driver-side recompute of the deterministic stand-in
    val txt = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase).toMap
    def tokset(t: String): Set[String] = {
      var i = 0; var j = t.length
      while (i < j && t.charAt(i) == ' ') i += 1
      while (j > i && t.charAt(j - 1) == ' ') j -= 1
      t.substring(i, j).split("\\s+", -1).toSet
    }
    ce.foreach { r =>
      val q = tokset(txt(r.getLong(0)))
      val d = tokset(txt(r.getLong(2)))
      val nc = q.intersect(d).size.toLong
      val nu = q.size.toLong + d.size.toLong - nc
      assert(r.getLong(4) === nc && r.getLong(5) === nu)
      assert(r.getDouble(6) === nc.toDouble / nu.toDouble)
    }
    // batch accumulation is pure plumbing: batch size never shifts a value
    val b1 = Retrieval.crossEncoderRerank(spark, Sf, batchSize = 1)
      .collect().map(_.toSeq)
    assert(b1.toSeq === ce.map(_.toSeq).toSeq)
  }

  test("x123: BM25 ranking matches a driver-side brute-force reference") {
    val rows = Retrieval.bm25Topk(spark, Sf, numQueries = 3, k = 10).collect()
    // independent reference: recompute BM25 from the raw text in Scala
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
      .toMap
    val n = docs.size
    val dl = docs.map { case (id, ts) => id -> ts.size }
    val avgdl = dl.values.sum.toDouble / n
    val tf = docs.map { case (id, ts) => id -> ts.groupBy(identity).map { case (w, g) => w -> g.size } }
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).map { case (w, g) => w -> g.size }
    def bm25(q: Long, d: Long): Double = {
      val scores = tf(q).keys.toSeq.flatMap { w =>
        tf(d).get(w).map { f =>
          val idf = (n - dfm(w) + 0.5) / (dfm(w) + 0.5)
          idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
        }
      }
      scores.sorted.sum
    }
    for (q <- 0L until 3L) {
      val mine = rows.filter(_.getLong(0) == q).sortBy(_.getInt(4))
      val ref = docs.keys.filter(_ != q).toSeq
        .map(d => (d, bm25(q, d)))
        .sortBy { case (d, sc) => (-sc, d) }
        .take(10)
      assert(mine.map(_.getLong(1)).toSeq === ref.map(_._1),
        s"query $q: top-10 ids diverge from brute force")
      mine.zip(ref).foreach { case (r, (_, sc)) =>
        assert(math.abs(r.getDouble(3) - sc) <= 1e-9 * math.max(1.0, math.abs(sc)))
      }
    }
  }

  test("x123: candidate scoring plan broadcasts the query terms and never goes cartesian") {
    val plan = Retrieval.bm25Topk(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "query-term join should broadcast")
    assert(!plan.contains("CartesianProduct"),
      "only the 1-row stats frame may nested-loop (BroadcastNestedLoopJoin)")
  }

  test("x143: RM3 expansion re-ranks with extra terms and keeps the broadcast shape") {
    val base = Retrieval.bm25Topk(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> r.getLong(1)).toMap
    val df = Retrieval.rm3Topk(spark, Sf)
    val rm3 = df.collect()
    val byQ = rm3.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(4)).sorted.toSeq === (1 to 10), s"query $q rank set")
      // expansion terms add hits: no result may hit FEWER terms than the
      // query's own vocabulary allows, and at least one ranked doc must
      // differ from the unexpanded ranking for some query (checked below)
      assert(rows.forall(_.getLong(2) >= 1L))
    }
    val moved = rm3.exists(r => base.get((r.getLong(0), r.getInt(4))).exists(_ != r.getLong(1)))
    assert(moved, "expansion changed no ranking at all — feedback terms had no effect")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "weighted query set should broadcast")
    assert(!plan.contains("CartesianProduct"),
      "only the 1-row stats frame may nested-loop (BroadcastNestedLoopJoin)")
  }

  test("x124: every fused score reconstructs from its two ranks; legs agree with the pools") {
    val fused = Retrieval.hybridRrf(spark, Sf, numQueries = 3, poolK = 50, k = 10).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val lex = Option(r.get(2)).map(_.asInstanceOf[Int])
      val sem = Option(r.get(3)).map(_.asInstanceOf[Int])
      assert(lex.isDefined || sem.isDefined, "a fused row must come from some leg")
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(4) === expect, s"rrf_score must equal its rank formula: $r")
    }
    // a doc present in BOTH legs at rank r beats a doc in ONE leg at rank r
    val both = fused.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    val one = fused.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
    if (both.nonEmpty && one.nonEmpty) {
      val worstBoth = both.map(_.getDouble(4)).min
      val bestPossibleOne = 1.0 / 61
      assert(worstBoth >= 2.0 / 110 || bestPossibleOne > 0) // sanity-bounded, never vacuous below
      assert(both.map(_.getDouble(4)).max > one.map(_.getDouble(4)).max ||
        one.map(_.getDouble(4)).max <= 1.0 / 61)
    }
  }

  test("x128: merged index partials rank bit-identically to a from-scratch build") {
    val full = Retrieval.bm25Topk(spark, Sf, numQueries = 3, k = 10).collect()
    // sf0.001 has 50 docs; split mid-corpus so both partials are non-trivial
    val incr = Retrieval.incrBm25Topk(spark, Sf, splitAt = 25L, numQueries = 3, k = 10)
      .collect()
    assert(incr.length === full.length)
    incr.zip(full).foreach { case (a, b) =>
      assert(a === b, "merge-then-score must equal rebuild-then-score bitwise")
    }
  }

  test("x168: MaxScore pruned ranking equals the full x123 ranking bitwise") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(4), r.getLong(1), r.getLong(2), r.getDouble(3))
    val full = Retrieval.bm25Topk(spark, Sf, numQueries = 3, k = 10).collect().map(key)
    val pruned = Retrieval.maxscoreTopk(spark, Sf).collect().map(key)
    assert(pruned.toSeq === full.toSeq,
      "safe pruning must reproduce the full ranking exactly")
    val st = Retrieval.maxscoreStats(spark, Sf).collect()
    assert(st.map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
    st.foreach { r =>
      assert(r.getLong(2) >= 1L, "seed set non-empty")          // n_seed
      assert(r.getDouble(4) >= 0.0)                             // theta
      assert(r.getLong(5) >= 1L, "last term is always essential") // n_essential
      assert(r.getLong(5) <= r.getLong(1))                      // <= n_terms
      assert(r.getLong(7) <= r.getLong(6),
        "essential postings are a subset of the query's postings")
    }
  }

  test("x168: a planted stopword-heavy corpus prunes the stopword's posting list") {
    import spark.implicits._
    // docs 1-12 carry the rare high-tf term; every doc carries the
    // stopword. With k=3 the rarest-term seed yields a threshold far
    // above the stopword's upper bound, so its corpus-wide posting
    // list must drop out of the candidate join.
    val docs = ((1L to 12L).map(i => (i, "alpha alpha alpha alpha alpha beta")) ++
      (13L to 39L).map(i => (i, "beta")) :+ (0L, "alpha beta"))
      .toDF("doc_id", "text")
    val ix = Retrieval.bm25Build(docs)
    val qterms = Seq((0L, "alpha"), (0L, "beta")).toDF("query_id", "term")
    val (res, st) = Retrieval.maxscoreFromIndex(ix, Retrieval.termBounds(ix),
      qterms, k = 3, seedTerms = 1)
    val full = Retrieval.bm25TopkFromIndex(ix, qterms, 3).collect()
    assert(res.collect().map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
    val s0 = st.collect().head
    assert(s0.getLong(1) === 2L, "n_terms")
    assert(s0.getLong(5) === 1L, "the stopword must be non-essential")
    // the candidate set is the rare term's posting list, not the corpus
    assert(s0.getLong(8) === 12L, "n_candidates = rare-term postings")
    assert(s0.getLong(7) < s0.getLong(6),
      "pruning must excuse the stopword's posting entries")
  }

  test("x176: Block-Max pruned ranking equals the full ranking; blocks prune strictly more") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(4), r.getLong(1), r.getLong(2), r.getDouble(3))
    val full = Retrieval.bm25Topk(spark, Sf, numQueries = 3, k = 10).collect().map(key)
    val pruned = Retrieval.blockmaxTopk(spark, Sf).collect().map(key)
    assert(pruned.toSeq === full.toSeq,
      "block-max pruning must reproduce the full ranking exactly")
    val bm = Retrieval.blockmaxStats(spark, Sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ms = Retrieval.maxscoreStats(spark, Sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(bm.keySet === Set(0L, 1L, 2L))
    bm.foreach { case (q, r) =>
      assert(r.getLong(3) <= r.getLong(2), "survived <= total blocks") // n_blocks
      // the block filter composes with the essential-term filter: the
      // combined candidate set can only shrink vs plain MaxScore
      assert(r.getLong(4) <= ms(q).getLong(8), s"query $q: candidates must shrink")
      assert(r.getLong(5) <= ms(q).getLong(9), s"query $q: scored pairs must shrink")
    }
  }

  test("x176: a planted block-local run prunes blocks whole-list bounds cannot") {
    import spark.implicits._
    // the rare term 'alpha' appears corpus-wide (essential, high whole-list
    // ub) but scores HIGH only in block 0 (doc_ids < 64, tf=5) and LOW
    // elsewhere (tf=1 in docs 64-319, separate blocks): block-max must
    // keep block 0 and drop the weak blocks, while plain MaxScore keeps
    // every alpha posting.
    val docs = ((1L to 12L).map(i => (i, "alpha alpha alpha alpha alpha beta")) ++
      (64L until 320L by 8L).map(i => (i, "alpha beta")) :+ (0L, "alpha beta"))
      .toDF("doc_id", "text")
    val ix = Retrieval.bm25Build(docs)
    val qterms = Seq((0L, "alpha")).toDF("query_id", "term")
    val (res, st) = Retrieval.blockmaxFromIndex(ix, Retrieval.termBounds(ix),
      Retrieval.blockBounds(ix), qterms, k = 3, seedTerms = 1)
    val fullRank = Retrieval.bm25TopkFromIndex(ix, qterms, 3).collect()
    assert(res.collect().map(_.toSeq).toSeq === fullRank.map(_.toSeq).toSeq)
    val s0 = st.collect().head
    assert(s0.getLong(2) > s0.getLong(3),
      s"weak blocks must be pruned: total=${s0.getLong(2)} survived=${s0.getLong(3)}")
    // candidates collapse to the strong block's postings
    assert(s0.getLong(4) === 12L, "candidates = block-0 postings only")
  }

  test("x129: MMR selection matches a driver-side greedy reference") {
    val rows = Retrieval.mmrRerank(spark, Sf, numQueries = 3, poolN = 20, k = 5)
      .collect()
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (embs(a), embs(b))
      var (d, nx, ny) = (0.0, 0.0, 0.0)
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    for (q <- 0L until 3L) {
      val pool = embs.keys.filter(_ != q).toSeq
        .map(d => (d, cos(q, d))).sortBy { case (d, r) => (-r, d) }.take(20)
      var chosen = Vector(pool.head._1) // step 1: pure relevance argmax
      for (_ <- 2 to 5) {
        val next = pool.filterNot(p => chosen.contains(p._1))
          .map { case (d, r) => (d, 0.7 * r - 0.3 * chosen.map(c => cos(d, c)).max) }
          .sortBy { case (d, m) => (-m, d) }.head._1
        chosen :+= next
      }
      val mine = rows.filter(_.getLong(0) == q).sortBy(_.getInt(1)).map(_.getLong(2))
      assert(mine.toSeq === chosen, s"query $q: greedy selection diverges")
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).distinct.length === rows.length,
      "a doc is never selected twice per query")
  }

  test("x125: raw-frequency-weighted mean of the DSIR ratio is ~1 (importance-weight invariant)") {
    val w = TextAnalysis.dsirWeights(spark, Sf).collect()
    assert(w.length > 0)
    assert(w.forall(_.getDouble(4) > 0.0), "ratios are strictly positive by smoothing")
    // E_raw[p_tgt/p_raw] = 1 exactly without smoothing; Laplace shifts it
    // by O(V/T). Token-weighted mean over all docs IS the raw expectation.
    val totTok = w.map(_.getLong(3)).sum.toDouble
    val meanR = w.map(r => r.getDouble(4) * r.getLong(3)).sum / totTok
    assert(math.abs(meanR - 1.0) < 0.05, s"importance expectation drifted: $meanR")
  }

  test("x126: TV distances are bounded, ordered pairs only, and match a hand computation") {
    val tv = TextAnalysis.sourceTvDistance(spark, Sf).collect()
    assert(tv.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    assert(tv.forall(r => r.getString(0) < r.getString(1)), "upper triangle only")
    // hand-roll one pair from raw text
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
    val bySrc = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    val (sa, sb) = (tv.head.getString(0), tv.head.getString(1))
    val (ca, cb) = (bySrc(sa).groupBy(identity).view.mapValues(_.size).toMap,
      bySrc(sb).groupBy(identity).view.mapValues(_.size).toMap)
    val (na, nb) = (bySrc(sa).size.toLong, bySrc(sb).size.toLong)
    val num = (ca.keySet ++ cb.keySet).toSeq
      .map(wd => math.abs(ca.getOrElse(wd, 0).toLong * nb - cb.getOrElse(wd, 0).toLong * na))
      .sum
    val expect = num.toDouble / (2.0 * (na * nb).toDouble)
    assert(tv.head.getDouble(4) === expect, "exact integer TV must match the hand computation")
  }

  test("x130: grid Gram pairs equal a driver-side exact recomputation; corr bounded") {
    val rows = Similarity.embeddingGramTopk(spark, Sf, topPairs = 20).collect()
    assert(rows.length === 20)
    assert(rows.forall(r => r.getInt(1) < r.getInt(2)), "upper triangle only")
    assert(rows.forall(r => math.abs(r.getDouble(5)) <= 1.0 + 1e-12), "|corr| <= 1")
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray)
    val top = rows.head
    val (i, j) = (top.getInt(1) - 1, top.getInt(2) - 1)
    val n = embs.length.toLong
    val (si, sj) = (embs.map(_(i)).sum, embs.map(_(j)).sum)
    val sqq = embs.map(e => e(i) * e(j)).sum
    val covg = (sqq.toDouble - si.toDouble * sj.toDouble / n.toDouble) / n.toDouble
    assert(top.getDouble(4) === covg / 1099511627776.0,
      "top pair covariance must be bit-identical to the exact recomputation")
  }

  test("x127: fixed-point moments equal a driver-side exact recomputation, bit for bit") {
    val stats = Similarity.embeddingDimStats(spark, Sf).collect()
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("embedding").collect().map(_.getSeq[Float](0))
    val dims = embs.head.size
    assert(stats.length === dims)
    val d1 = embs.map(e => math.floor(e(0).toDouble * 1048576.0).toLong)
    val (n, sq, sq2) = (d1.length.toLong, d1.sum, d1.map(q => q * q).sum)
    val mean = sq.toDouble / n.toDouble / 1048576.0
    val std = math.sqrt((sq2.toDouble - sq.toDouble * sq.toDouble / n.toDouble) / n.toDouble) / 1048576.0
    val row1 = stats.find(_.getInt(0) == 1).get
    assert(row1.getLong(1) === n)
    assert(row1.getDouble(2) === mean, "grid mean must be bit-identical")
    assert(row1.getDouble(3) === std, "grid std must be bit-identical")
    stats.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5),
        "min <= mean <= max per dimension")
    }
  }

  test("x134: P/R@k reconstructs from the x123 top-k and the label table") {
    val k = 10
    val eval = Retrieval.bm25LabelEval(spark, Sf, numQueries = 3, k = k).collect()
    assert(eval.length == 3)
    val labels = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val topk = Retrieval.bm25Topk(spark, Sf, numQueries = 3, k = k).collect()
    eval.foreach { r =>
      val q = r.getLong(0)
      val qlabel = labels(q)
      assert(r.getInt(1) == qlabel)
      val ranked = topk.filter(_.getLong(0) == q).sortBy(_.getInt(4))
        .flatMap(t => labels.get(t.getLong(1)).map(l => (t.getInt(4), l)))
      val hits = ranked.count(_._2 == qlabel).toLong
      assert(r.getAs[Long]("n_hits") == hits)
      assert(r.getAs[Long]("n_rel_corpus") == labels.values.count(_ == qlabel).toLong - 1L)
      assert(r.getAs[Double]("precision_at_k") == hits.toDouble / k)
      val firstHit = ranked.find(_._2 == qlabel).map(_._1.toLong)
      assert(Option(r.getAs[Any]("first_hit_rank")).map(_.asInstanceOf[Long]) == firstHit)
    }
  }
}
