package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Correctness contracts for the dedup operators that the DuckDB oracle
  * cannot see (xxhash64 is Spark-specific): the LSH candidate set must
  * cover the exact near-dup pairs, and the two simhash formulations
  * (relational aggregate vs column expression) must agree.
  */
class DedupSpec extends SparkSpec {

  /** Brute-force exact Jaccard over all doc pairs (sf0.001 is ~50 docs,
    * so the cross join is trivially small) — the ground truth the
    * approximate paths are held against.
    */
  private lazy val exactPairs: Map[(Long, Long), Double] = {
    val docs = Dedup.docShingles(spark, Sf)
    docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
          (size(col("a.shingles")) + size(col("b.shingles")) -
            size(array_intersect(col("a.shingles"), col("b.shingles")))).cast("double"))
          .as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
  }

  test("shinglePostings agrees with the array-form docShingles") {
    val fromArrays = Dedup.docShingles(spark, Sf)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val posts = Dedup.shinglePostings(spark, Sf)
    assert(posts.exceptAll(fromArrays).isEmpty && fromArrays.exceptAll(posts).isEmpty)
  }

  test("wordShingles yields empty array below n tokens") {
    val row = spark.sql("SELECT array('a','b') AS toks")
      .select(Dedup.wordShingles(col("toks"), 3).as("sh"))
      .head()
    assert(row.getSeq[String](0).isEmpty)
  }

  test("generator shingle postings equal the window spelling exactly") {
    val viaGen = Dedup.shinglePostings(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaWindow = Dedup.windowShinglePostings(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaGen.nonEmpty && viaGen == viaWindow)
    // and the generator subtree must not shuffle before the dedup
    // (asserted on the plan spelling — the cached form is a checkpoint scan)
    val plan = Dedup.shinglePostingsPlan(spark, Sf, 3).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected only the dedup shuffle, got $exchanges:\n$plan")
  }

  test("two-pass df-cut candidates equal the one-pass spelling exactly") {
    // The two-pass cut (count df first, semi-join to rare shingles, then
    // collect bounded lists) must produce the identical candidate set as
    // the round-6 one-pass collect-then-filter spelling, at both the
    // default cut and a tighter one.
    val posts = Dedup.shinglePostings(spark, Sf)
    for ((maxDf, minCommon) <- Seq((20, 3), (5, 2))) {
      val twoPass = Dedup.dfCutCandidates(posts, maxDf, minCommon)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val onePass = Dedup.onePassDfCutCandidates(posts, maxDf, minCommon)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(twoPass == onePass, s"candidate sets diverge at ($maxDf, $minCommon)")
    }
    // and the at-scale invariant: no collect_list runs before the df cut —
    // every objectagg in the plan must sit above the rare-shingle semi-join
    val plan = Dedup.dfCutCandidates(posts, 20, 3)
      .queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("collect_list")
    val semiIdx = plan.indexOf("LeftSemi")
    assert(aggIdx >= 0 && semiIdx > aggIdx,
      s"collect_list must be downstream of the df semi-join:\n$plan")
  }

  test("connected components of an empty pair set is empty, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).isEmpty)
  }

  test("connected components resolve chains, cycles and isolated pairs") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L),
      "every node must carry its component's minimum id")
  }

  test("minhashPairs covers every strongly-similar exact pair") {
    val found = Dedup.minhashPairs(spark, Sf, threshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 bands x 4 rows detects j=0.8 with p ~ 0.9998 (and the hash seeds
    // are fixed, so this is deterministic for the fixture); pairs near the
    // 0.5 threshold are only ~65%-likely candidates by design.
    val expected = exactPairs.filter(_._2 >= 0.8).keySet
    assert(expected.nonEmpty, "fixture should contain near-duplicate pairs")
    assert(expected.subsetOf(found),
      s"missed pairs: ${expected -- found}")
  }

  test("minhashPairs reports the exact Jaccard for each emitted pair") {
    Dedup.minhashPairs(spark, Sf, threshold = 0.5).collect().foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(math.abs(r.getAs[Double]("jaccard") - exactPairs(key)) < 1e-12)
    }
  }

  test("jaccardTopk matches brute force on head pairs") {
    val topk = Dedup.jaccardTopk(spark, Sf).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(math.abs(r.getAs[Double]("jaccard") - exactPairs(key)) < 1e-12)
    }
    // the maximum similarity cannot be lost to the df cut
    val best = exactPairs.values.max
    assert(math.abs(topk.head.getAs[Double]("jaccard") - best) < 1e-12)
  }

  test("containmentTopk matches brute force and dominates Jaccard") {
    val exactContainment: Map[(Long, Long), Double] = {
      val docs = Dedup.docShingles(spark, Sf)
      docs.as("a").crossJoin(docs.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          (size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
            least(size(col("a.shingles")), size(col("b.shingles"))).cast("double"))
            .as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    }
    val topk = Dedup.containmentTopk(spark, Sf).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(math.abs(r.getAs[Double]("containment") - exactContainment(key)) < 1e-12)
      // min(|A|,|B|) <= |A union B|, so containment >= jaccard always
      assert(r.getAs[Double]("containment") >= exactPairs(key) - 1e-12)
    }
    // the maximum containment cannot be lost to the df cut
    assert(math.abs(topk.head.getAs[Double]("containment") - exactContainment.values.max) < 1e-12)
  }

  test("winnowing selects a sparse subset of gram hashes; exact copies share fingerprints") {
    val fps = Dedup.winnowedFingerprints(spark, Sf) // (doc_id, fp), k=4, w=5
    // every fingerprint IS one of the doc's 4-gram hashes (window-min
    // selects, never invents)
    val toks = TextAnalysis.wsTokens(lower(col("text")))
    val gramHashes = graft.engine.Tables(spark, Sf, "documents")
      .select(col("doc_id"), explode(Dedup.gramHashes(toks, 4)).as("fp"))
      .distinct()
    assert(fps.join(gramHashes, Seq("doc_id", "fp"), "left_anti").count() == 0L)
    // density ~2/(w+1): far sparser than the full gram set
    val nFp = fps.count().toDouble
    val nGrams = gramHashes.count().toDouble
    assert(nFp > 0 && nFp < 0.6 * nGrams, s"winnowing kept $nFp of $nGrams grams")
    // the winnowing GUARANTEE (SIGMOD'03 Thm: any match of >= w+k-1
    // consecutive tokens shares a selected fingerprint), exercised on a
    // synthetic corpus: two docs share exactly an 8-token run (w+k-1 =
    // 5+4-1 = 8) inside otherwise-disjoint text
    val tmp = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    import spark.implicits._
    Seq(
      (1L, "a1 a2 c d e f g h i j b1 b2"),
      (2L, "x1 x2 c d e f g h i j y1 y2"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val fpSets = Dedup.winnowedFingerprints(spark, tmp).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(fpSets(1L).intersect(fpSets(2L)).nonEmpty,
      "docs sharing a (w+k-1)-token run must share a winnowed fingerprint")
    assert(fpSets(1L).intersect(fpSets(3L)).isEmpty,
      "disjoint docs share no fingerprint")
  }

  test("relational simhashSketch equals the expression-form simhash64") {
    val rel = Dedup.simhashSketch(spark, Sf)
    val expr = graft.engine.Tables(spark, Sf, "documents")
      .select(col("doc_id"),
        Dedup.simhash64(graft.ext.TextAnalysis.wsTokens(lower(col("text")))).as("simhash"))
    assert(rel.exceptAll(expr).isEmpty && expr.exceptAll(rel).isEmpty)
  }

  test("identical texts collapse to identical simhash (Hamming 0)") {
    val sketches = Dedup.simhashSketch(spark, Sf)
    val byText = graft.engine.Tables(spark, Sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("tkey"))
    val joined = byText.join(sketches, "doc_id")
      .groupBy("tkey")
      .agg(countDistinct(col("simhash")).as("n_sketches"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
    assert(joined.filter(col("n_sketches") =!= 1).isEmpty,
      "identical texts must hash to identical sketches")
  }

  test("simhash uses only the declared 60 bits") {
    val bad = Dedup.simhashSketch(spark, Sf)
      .filter(col("simhash").bitwiseAND(lit(0xF000000000000000L)) =!= 0L)
    assert(bad.isEmpty)
  }

  test("band-bucketed simhash near-dup equals brute-force Hamming <= 3") {
    val banded = Dedup.simhashNearDup(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sk = Dedup.simhashSketch(spark, Sf)
    val a = sk.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = sk.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    val brute = a.crossJoin(b) // test-scale oracle only
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      "pigeonhole banding (4 x 15 bits) must be exact for Hamming <= 3")
  }

  test("incremental near-dup equals the exact pair set restricted to the increment") {
    // ground truth: exact shingle-Jaccard pairs with an increment member
    val histMax = 25L // sf0.001 has ~50 docs; split mid-corpus
    val exact = exactPairs.filter { case ((a, b), j) => j >= 0.5 && b >= histMax }.keySet
    val got = Dedup.incrementalNearDup(spark, Sf, histMax = histMax.toInt)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(4))).toMap
    assert(got.keySet == exact,
      s"32x2 banding must emit exactly the exact increment pairs; got ${got.keySet} want $exact")
    got.foreach { case ((a, _), internal) =>
      assert(internal == (a >= histMax), "incr_internal must flag within-increment pairs")
    }
    // no history-history pair may appear
    assert(got.keySet.forall(_._2 >= histMax))
  }

  test("source near-dup matrix attributes every verified pair exactly once") {
    val nPairs = Dedup.minhashPairs(spark, Sf, bands = 32, rowsPerBand = 2).count()
    val m = Dedup.sourceNearDupMatrix(spark, Sf).collect()
    assert(m.map(_.getLong(2)).sum == nPairs,
      "cell counts must partition the verified pair set")
    m.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "unordered pair normalization")
      assert(r.getDouble(3) >= 0.5, "cells only aggregate verified >= 0.5 pairs")
    }
  }

  test("indexed incremental near-dup equals the inline path, history scan unshuffled") {
    val inline = Dedup.incrementalNearDup(spark, Sf, histMax = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = Dedup.incrementalNearDupIndexed(spark, Sf, histMax = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed == inline,
      "bucket-only probe + exact verification must emit x86's exact pair set")
    // the probe join's bucketed (history) side must carry no Exchange:
    // isolate the join subplan — exactly ONE shuffle (the small probe
    // side meeting the index's bucket partitioning)
    val tbl = Dedup.buildBandIndex(spark, Sf, histMax = 25)
    val hist = spark.table(tbl)
      .select(col("bucket"), col("doc_id").as("doc_a"))
    val probe = Dedup.bandedBuckets(
        Dedup.shinglePostings(spark, Sf).filter(col("doc_id") >= 25), 32, 2)
      .select(col("bucket"), col("doc_id").as("doc_b"))
    val plan = probe.join(hist, Seq("bucket")).queryExecution.executedPlan.toString
    assert(plan.contains("graft_band_idx2_"), s"expected the persisted index scan:\n$plan")
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 1, s"expected one probe-side shuffle only, got $nEx:\n$plan")
  }

  test("boilerplate spans localize a passage shared across documents") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    val passage = "all rights reserved contact support for legal help"
    Seq(
      (1L, s"alpha beta gamma delta $passage"),
      (2L, s"$passage epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val spans = Dedup.boilerplateSpans(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the 8-token passage = 5 k=4 grams entirely inside it, shared by
    // docs 1 and 2; boundary grams mixing unique context are df=1
    assert(spans.toSet == Set((1L, 4L, 5L, 8L), (2L, 0L, 5L, 8L)),
      s"expected the shared passage localized in both carriers, got ${spans.toSeq}")
  }

  test("materialized cluster table round-trips and pins versions") {
    val root = java.nio.file.Files.createTempDirectory("graft_clusters").toString + "/t"
    val v0 = Dedup.materializeClusters(spark, Sf, root)
    assert(v0 == 0L)
    val direct = Dedup.dupClusters(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromTable = Dedup.clustersFromTable(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromTable == direct, "committed snapshot must equal the live clustering")
    // a re-publish creates v1; a reader pinned to v0 is undisturbed
    val v1 = Dedup.materializeClusters(spark, Sf, root)
    assert(v1 == 1L)
    assert(Dedup.clustersFromTable(spark, root, Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == direct)
  }

  test("overlap-span gram scan is pruned to the audited doc ids (pushed IN filter)") {
    val g = Dedup.prunedGrams(spark, Sf, Seq(1L, 2L, 3L), 4)
    val p = g.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("In(doc_id"),
      s"x85's documents scan must carry the pair-id IN filter pushed to parquet:\n$p")
    val ids = g.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(Set(1L, 2L, 3L)), "scan must only read the audited docs")
  }

  test("policy operators share one CC resolution and agree with it") {
    // x75 keep-longest and x61 split both consume the cached labels:
    // every doc x47 clusters appears with the same cluster resolution
    val clusters = Dedup.dupClusters(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val canon = Dedup.canonicalSelection(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(canon == clusters, "x75 must carry x47's exact cluster ids")
    val split = Dedup.leakageSafeSplit(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    clusters.foreach { case (doc, lbl) =>
      assert(split(doc) == lbl, s"x61 cluster for doc $doc must match x47")
    }
    // exactly one keeper per cluster, and it is a longest member
    val kept = Dedup.canonicalSelection(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    kept.groupBy(_._2).foreach { case (cl, rows) =>
      assert(rows.count(_._4) == 1, s"cluster $cl must keep exactly one doc")
      val keeper = rows.find(_._4).get
      assert(keeper._3 == rows.map(_._3).max,
        s"cluster $cl keeper must have the max token count")
    }
  }

  test("x149 line dedup matches a driver-side first-occurrence reference") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val lines = docs.flatMap { case (id, text) =>
      text.split("\n", -1).zipWithIndex.map { case (l, i) => (id, i, l.trim) }
    }
    val firsts = lines.filter(_._3.nonEmpty).groupBy(_._3)
      .map { case (t, occ) => (t, occ.map(o => (o._1, o._2)).min) }
    val expected = docs.map { case (id, text) =>
      val mine = lines.filter(_._1 == id)
      val ne = mine.filter(_._3.nonEmpty)
      val kept = ne.filter { case (d, i, t) => firsts(t) == ((d, i)) }
      (id, mine.length.toLong, ne.length.toLong, kept.length.toLong,
        (ne.length - kept.length).toLong, kept.map(_._3.length.toLong).sum)
    }
    val got = Dedup.lineDedup(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq === expected.toSeq)
  }

  test("x149 line dedup drops repeated boilerplate, keeps first occurrence, spares blanks") {
    // the driver fixture has no duplicate lines (every doc is a single
    // distinct line), so the drop path needs its own corpus: a shared
    // footer across three docs, once with surrounding whitespace, plus
    // a blank line that must never join a dup class
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("x149docs").toString
    Seq(
      (0L, "alpha beta\nCOMMON FOOTER\nunique zero", "en", "web", 36L),
      (1L, "COMMON FOOTER\ngamma delta", "en", "web", 25L),
      (2L, "  COMMON FOOTER  \n\nunique two", "en", "web", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.lineDedup(spark, tmp).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq === Seq(
      (0L, 3L, 3L, 3L, 0L, 34L),  // first occurrence of the footer kept
      (1L, 2L, 2L, 1L, 1L, 11L),  // exact repeat dropped
      (2L, 3L, 2L, 1L, 1L, 10L))) // whitespace-trimmed repeat dropped; blank uncounted
  }

  test("x154 threshold sweep matches a driver-side reference over the df-cut candidates") {
    val posts = Dedup.shinglePostings(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = posts.groupBy(_._1).map { case (d, hs) => (d, hs.map(_._2).toSet) }
    val df = posts.groupBy(_._2).map { case (h, ds) => (h, ds.length) }
    val rare = df.filter { case (_, c) => c >= 2 && c <= 20 }.keySet
    val rareByDoc = byDoc.map { case (d, hs) => (d, hs & rare) }
    val cands = (for {
      (a, ha) <- rareByDoc.toSeq; (b, hb) <- rareByDoc.toSeq
      if a < b
      shared = (ha & hb).size
      if shared >= math.min(3, math.min(ha.size, hb.size)) && shared > 0
    } yield (a, b)).toSet
    val pairStats = cands.toSeq.map { case (a, b) =>
      val common = (byDoc(a) & byDoc(b)).size.toLong
      (a, b, byDoc(a).size.toLong, byDoc(b).size.toLong, common)
    }
    val expected = Seq(50L, 60L, 70L, 80L).map { pct =>
      val q = pairStats.filter { case (_, _, na, nb, c) => c * 100 >= pct * (na + nb - c) }
      val dropped = q.flatMap { case (a, b, na, nb, _) =>
        Seq((a, na, nb, b), (b, nb, na, a))
      }.collect { case (id, nMe, nOther, other)
          if nOther > nMe || (nOther == nMe && other < id) => id
      }.distinct
      (pct, q.size.toLong, dropped.size.toLong)
    }
    val got = Dedup.dedupThresholdSweep(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected)
    // sweep monotonicity: raising tau can only shrink both counts
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.reverse.toSeq)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.reverse.toSeq)
  }

  test("x210 contamination: a copied eval doc flags, a fresh one does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "train", "alpha beta gamma delta epsilon zeta"),
      (2L, "train", "one two three four five six seven"),
      // eval doc 10 copies train doc 1's opening — every 4-gram hits
      (10L, "eval", "alpha beta gamma delta epsilon"),
      // eval doc 11 shares no 4-gram with any train doc
      (11L, "eval", "red orange yellow green blue indigo")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.contaminationOf(docs, n = 4,
      evalSource = "eval", threshold = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got(10L) === ((2L, 2L, true)))  // both distinct 4-grams hit
    assert(got(11L) === ((3L, 0L, false)))
  }

  /** A corpus with planted exact clones — every clone-collapse branch is
    * live: a clone pair riding a cross-group near-dup edge, an isolated
    * clone pair (multi-member group whose rep has no rep-level pair),
    * a singleton, and shingle-less clones (must stay absent).
    */
  private def writeCloneCorpus(): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_clone_cc").toString
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // last token changed: 6 of 10 shingles shared -> exact Jaccard 0.6
    val t1b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val t2 = "one two three four five six seven eight nine ten"
    Seq(
      (0L, t1), (1L, t1), (2L, t1b),
      (3L, t2), (4L, t2),
      (5L, "completely different vocabulary avoiding any overlap whatsoever"),
      (6L, "hi"), (7L, "hi"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("clone-collapsed cluster labels equal the doc-level CC reference") {
    val tmp = writeCloneCorpus()
    val got = Dedup.clusterLabels(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the r17 doc-level spelling — CC over the verified
    // banded pairs of the FULL corpus (quadratic in clones, fine here);
    // minhashPairsFromPosts on the full postings IS doc-level banding
    val ref = Dedup.connectedComponents(
        Dedup.minhashPairsFromPosts(Dedup.shinglePostings(spark, tmp),
            bands = 32, rowsPerBand = 2, threshold = 0.5)
          .select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref, s"collapsed labels $got != doc-level reference $ref")
    // clone-structure invariants that hold regardless of banding luck:
    // clones always share a component; the isolated clone pair forms its
    // own min-id component; the singleton and shingle-less docs are absent
    val gm = got.toMap
    assert(gm(0L) == gm(1L), "clones 0/1 must share a label")
    assert(gm(3L) == 3L && gm(4L) == 3L, "isolated clone pair labels to its min id")
    assert(!gm.contains(5L) && !gm.contains(6L) && !gm.contains(7L),
      "singletons and shingle-less docs are not labeled")
    // the cross-group near-dup edge (j=0.6, caught by 32x2 banding on
    // this fixture) pulls 2 into the 0/1 component
    assert(gm.get(2L).contains(0L), s"expected doc 2 in component 0, got $gm")
  }

  test("clone-collapsed minhashPairs equals doc-level banding on planted clones") {
    val tmp = writeCloneCorpus()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val got = rows(Dedup.minhashPairs(spark, tmp, bands = 32, rowsPerBand = 2))
    val ref = rows(Dedup.minhashPairsFromPosts(Dedup.shinglePostings(spark, tmp),
      bands = 32, rowsPerBand = 2, threshold = 0.5))
    assert(got == ref, s"collapsed pair set $got != doc-level reference $ref")
    // the in-group expansion path is live: clone pairs at jaccard 1.0
    // with n_common = the text's own shingle count (t1/t2 have 10 tokens
    // -> 8 distinct 3-gram shingles)
    assert(got.contains((0L, 1L, 8L, 1.0)) && got.contains((3L, 4L, 8L, 1.0)),
      s"clone pairs must carry (n_common=8, jaccard=1.0): $got")
  }

  test("clone-collapsed simhash near-dup equals brute force on planted clones") {
    val tmp = writeCloneCorpus()
    val banded = Dedup.simhashNearDup(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sk = Dedup.simhashSketch(spark, tmp)
    val a = sk.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = sk.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    val brute = a.crossJoin(b) // test-scale oracle only
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"sketch-collapsed banding must stay exact; got $banded want $brute")
    // the planted clone pairs surface through the in-group expansion
    assert(banded.contains((0L, 1L, 0L)) && banded.contains((3L, 4L, 0L))
      && banded.contains((6L, 7L, 0L)),
      s"clone pairs must appear at Hamming 0: $banded")
  }
}
