package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ANN contract: the LSH-bucketed path must recover (nearly) the exact
  * brute-force neighbors. sf0.01 per the acceptance bar; the fixed
  * hyperplane seed makes the measurement deterministic.
  */
class SimilaritySpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  test("ann recall >= 0.9 against exact cosine top-10") {
    val exact = Similarity.cosineTopk(spark, Dir).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopk(spark, Dir).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"recall = $recall (${(exact & ann).size}/${exact.size})")
    assert(recall >= 0.9, s"ANN recall $recall below 0.9")
  }

  test("ivf recall >= 0.9 against exact cosine top-10") {
    val exact = Similarity.cosineTopk(spark, Dir).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopk(spark, Dir).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"ivf recall = $recall probing 6/16 cells")
    assert(recall >= 0.9, s"IVF recall $recall below 0.9")
  }

  test("exact top-k ranks are dense 1..k per query") {
    val ranks = Similarity.cosineTopk(spark, Dir)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(ranks.length == 5)
    ranks.foreach { r =>
      assert(r.getAs[Long]("n") == 10 && r.getAs[Int]("lo") == 1 && r.getAs[Int]("hi") == 10)
    }
  }

  test("indexed ann equals the inline ann and prunes the bucketed scan") {
    val inline = Similarity.annTopk(spark, Dir).collect().toSeq
    val indexed = Similarity.annTopkIndexed(spark, Dir).collect().toSeq
    assert(indexed == inline,
      "same planes + params must produce identical results from the persisted index")
    val plan = Similarity.annTopkIndexed(spark, Dir).queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned scan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"probe must read a strict subset of buckets: ${m.get.matched}")
    // the large-probe tier (maxProbeLiterals = 0 forces it): identical
    // answer, no collected literal, the probe is a broadcast semi-join
    // — the shape that scales past a handful of queries
    val semi = Similarity.annTopkIndexed(spark, Dir, maxProbeLiterals = 0)
    assert(semi.collect().toSeq == inline,
      "the semi-join tier must change the plan, never the answer")
    val semiPlan = semi.queryExecution.executedPlan.toString
    assert(!semiPlan.contains(" IN ("),
      s"no probe-key literal may ride the semi-join tier plan:\n$semiPlan")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(semiPlan).isDefined,
      s"the probe must be a BROADCAST semi-join (index side never shuffles):\n$semiPlan")
  }

  test("driver-gated ANN forms pin both recall contracts true") {
    for ((nm, df) <- Seq(
        ("ann", Similarity.annTopkGated(spark, Dir)),
        ("ivf", Similarity.ivfTopkGated(spark, Dir)),
        ("idx", Similarity.annTopkIndexedGated(spark, Dir)))) {
      val rows = df.collect()
      assert(rows.length == 5, s"$nm: one gate row per query")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_exact") == 10L, s"$nm: exact side must be full k")
        assert(r.getAs[Boolean]("recall_ok"), s"$nm: per-query 0.8 floor violated: $r")
        assert(r.getAs[Boolean]("pooled_ok"), s"$nm: pooled 0.9 floor violated: $r")
      }
    }
  }

  test("blocked near-dup pair set is block-size invariant (incl. multi-block)") {
    def pairs(blockSize: Int) =
      Similarity.embeddingNearDup(spark, Dir, blockSize = blockSize)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val one = pairs(blockSize = 100000) // single block: plain all-pairs loop
    val many = pairs(blockSize = 37)    // forces cross-block pairs + odd tail
    assert(one.nonEmpty)
    assert(many.keySet == one.keySet, "blocking must not add or drop pairs")
    one.foreach { case (k, c) => assert(many(k) == c, s"cosine differs for $k") }
  }

  test("banded near-dup is a subset of exact with full top-bucket recall") {
    val exact = Similarity.embeddingNearDup(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = Similarity.bandedNearDup(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(banded.nonEmpty)
    assert(banded.keySet.subsetOf(exact.keySet),
      "exact-verified candidates can never include a non-qualifying pair")
    banded.foreach { case (k, c) =>
      assert(c == exact(k), s"verify leg must reproduce the exact cosine for $k")
    }
    val recall = banded.size.toDouble / exact.size
    info(s"overall recall = $recall (${banded.size}/${exact.size})")
    assert(recall >= 0.4, "even at the information-theoretic floor the banded " +
      "lane recovers a large fraction of the 3-sigma tail")
    // at the dedup operating point (top vigintile of this corpus) nothing is
    // missed — the S-curve's high end is where the lane must be lossless
    val topBucket = exact.values.map(c => math.floor(c * 20)).max
    val topExact = exact.filter { case (_, c) => math.floor(c * 20) == topBucket }
    assert(topExact.keySet.forall(banded.contains),
      s"missed a top-bucket pair: ${topExact.keySet.filterNot(banded.contains)}")
  }

  test("banded lane stays relational: no object-kernel node in the plan") {
    // x24's block-pair kernel deserializes to objects (flatMap); the banded
    // path must never — this is the no-all-pairs plan gate for the x57
    // lane. Gate the UNCHECKPOINTED plan: the cached form's plan is just a
    // checkpoint scan and would pass vacuously.
    // gate the UNCACHED sketch pipeline (srpBandKeys is session-
    // checkpointed, so the composed plan would show a cache scan)
    val sketchPlan = Similarity
      .srpBandKeysFor(spark, graft.engine.Tables(spark, Dir, "embeddings"))
      .queryExecution.executedPlan.toString
    assert(!sketchPlan.contains("DeserializeToObject"),
      s"sketch pipeline must be pure relational:\n$sketchPlan")
    // since r10 the sketch is ONE map-side pass over the native kernel:
    // no shuffle and no aggregate may appear at any corpus size
    assert(sketchPlan.contains("srp_band_keys"),
      s"sanity: the gated plan is the real native sketch pipeline:\n$sketchPlan")
    assert(!sketchPlan.contains("Exchange") && !sketchPlan.contains("HashAggregate"),
      s"native sketch must be shuffle- and aggregate-free:\n$sketchPlan")
    val bandedPlan = Similarity
      .bandedNearDupPlan(spark, Dir, 0.4, Similarity.WideSrpBits, Similarity.WideBandBits)
      .queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("DeserializeToObject"),
      s"banded near-dup must be pure relational:\n$bandedPlan")
    val clustersPlan = Similarity.embeddingDupClusters(spark, Dir)
      .queryExecution.executedPlan.toString
    assert(!clustersPlan.contains("DeserializeToObject"),
      "x57 must consume the banded lane, not the all-pairs kernel")
  }

  test("native band-key kernel is bit-identical to the relational spelling") {
    val emb = graft.engine.Tables(spark, Dir, "embeddings")
    // the adaptive default at this corpus (8-bit clamp) AND a
    // non-default geometry exercising a partial last band (100 % 9 != 0)
    for ((sb, bb) <- Seq((Similarity.WideSrpBits, Similarity.WideBandBits), (100, 9))) {
      val native = Similarity.srpBandKeysFor(spark, emb, sb, bb)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val relational = Similarity.srpBandKeysRelational(spark, emb, sb, bb)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(native.nonEmpty && native == relational,
        s"band keys must agree bitwise at geometry ($sb, $bb)")
    }
  }

  test("indexed incremental banded near-dup equals inline and probes co-located") {
    val inline = Similarity.incrementalBandedNearDup(spark, Dir, histMax = 250)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val indexed = Similarity.incrementalBandedNearDupIndexed(spark, Dir, histMax = 250)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(inline.nonEmpty, "the 250/250 split must produce cross-side pairs")
    assert(indexed.toSeq == inline.toSeq,
      "the persisted index must change the plan, never the answer")
    assert(inline.forall { case (a, b, _, internal) =>
      a < b && (internal == (a >= 250)) }, "orientation and flag contract")
    // the probe join's bucketed (history) side must carry no Exchange:
    // exactly ONE shuffle — the increment's skinny keys meeting the
    // index's bucket partitioning (the DedupSpec x98 gate, embedding side)
    val tbl = Similarity.buildEmbBandIndex(spark, Dir, histMax = 250)
    val hist = spark.table(tbl)
    // materialize the probe keys so the sketch pipeline's own aggregation
    // shuffles don't appear in the JOIN plan, and pin a shuffle join so
    // the gate is deterministic (a broadcast would trivially pass)
    val probe = Similarity.srpBandKeys(spark, Dir)
      .filter(col("vec_id") >= 250)
      .select(col("vec_id").as("pv"),
        (col("band") * 256 + col("key")).as("bk"))
      .localCheckpoint(true)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = probe.join(hist, Seq("bk")).queryExecution.executedPlan.toString
      assert(plan.contains("graft_emb_band_idx_"),
        s"expected the persisted index scan:\n$plan")
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nEx == 1, s"expected one probe-side shuffle only, got $nEx:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  test("collapsed incremental lane equals the doc-level spelling on a planted-clone corpus") {
    // exact-content clone groups in every position the collapse must
    // handle: straddling the histMax boundary (A), a hist+incr pair (B),
    // a hist-only singleton (C), an incr-only trio (D), an incr
    // singleton (E) — at threshold -1 every bucket-sharing candidate
    // survives, so the gate covers candidacy, cosine inheritance,
    // in-group self-cosine, orientation, and the incr_internal flag.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_incrclone").toString
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 97.0 + i) * 0.5).toFloat)
    val rows = Seq(
      0L -> vec(1), 1L -> vec(1), 2L -> vec(2), 3L -> vec(3), 4L -> vec(4),
      12L -> vec(1), 13L -> vec(1), 14L -> vec(2),
      15L -> vec(5), 16L -> vec(5), 17L -> vec(5), 18L -> vec(6))
    rows.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    val got = rowsOf(Similarity.incrementalBandedNearDup(spark, dir,
      histMax = 10, threshold = -1.0))
    val ref = rowsOf(Similarity.incrementalBandedNearDupDoc(spark, dir,
      histMax = 10, threshold = -1.0))
    assert(got.nonEmpty, "planted clones must produce pairs (vacuity guard)")
    assert(got === ref, "collapse must be invisible in the answer")
    // the clone trio's in-group pairs are present with the self-cosine
    val trio = got.filter(p => Set(15L, 16L, 17L).contains(p._1) &&
      Set(15L, 16L, 17L).contains(p._2))
    assert(trio.size === 3 && trio.forall(_._4))
  }

  test("collapsed full-corpus banded lane and labels equal the doc-level spellings on planted clones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bandclone").toString
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 97.0 + i) * 0.5).toFloat)
    // clone trios/pairs/singletons (zero-norm vectors are outside the
    // lane's domain in BOTH spellings — ANSI divide-by-zero)
    val rows = Seq(
      0L -> vec(1), 1L -> vec(1), 2L -> vec(1),
      3L -> vec(2), 4L -> vec(2),
      5L -> vec(3), 6L -> vec(4))
    rows.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.bandedNearDup(spark, dir, threshold = -1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ref = Similarity.bandedNearDupPlan(spark, dir, -1.0,
      Similarity.WideSrpBits, Similarity.WideBandBits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty, "planted clones must produce pairs (vacuity guard)")
    assert(got === ref, "collapse must be invisible in the pair set")
    // labels: the rep-grain CC + group expansion equals CC over the
    // expanded pair set (an independent path through the same kernel)
    val gotLabels = Similarity.embeddingDupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pairFrame = Similarity.bandedNearDup(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val refLbl = Dedup.connectedComponents(pairFrame)
    val refSizes = refLbl.groupBy(col("lbl")).count()
    val refLabels = refLbl.join(refSizes, "lbl")
      .select(col("id"), col("lbl"), col("count")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotLabels === refLabels)
  }

  test("streaming band probe equals the batch incremental minus cross-batch pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val HistMax = 250
    val Split = 375 // increment rows arrive as [250,375) then [375,500)
    val incRows = graft.engine.Tables(spark, Dir, "embeddings")
      .filter(col("vec_id") >= HistMax)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dirs = java.nio.file.Files.createTempDirectory("graft_streamprobe").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = Similarity.streamingBandProbe(spark,
      in.toDF().toDF("vec_id", "embedding"), Dir,
      s"$dirs/pairs", s"$dirs/ckpt", histMax = HistMax)
    try {
      in.addData(incRows.filter(_._1 < Split).toSeq: _*)
      q.processAllAvailable()
      in.addData(incRows.filter(_._1 >= Split).toSeq: _*)
      q.processAllAvailable()
      val vs = graft.engine.VersionedTable.versions(spark, s"$dirs/pairs")
      assert(vs == Seq(0L, 1L), s"one snapshot per micro-batch: $vs")
      val streamed = vs.flatMap { v =>
        graft.engine.VersionedTable.read(spark, s"$dirs/pairs", Some(v))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      }.toMap
      val inline = Similarity.incrementalBandedNearDup(spark, Dir, histMax = HistMax)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // the standing index can't see across micro-batches: increment-
      // internal pairs straddling the two batches surface only at the
      // next index refresh — everything else must match exactly
      val crossBatch = inline.keySet.filter { case (a, b) =>
        a >= HistMax && a < Split && b >= Split }
      assert(streamed.keySet == inline.keySet -- crossBatch,
        s"streamed=${streamed.size} inline=${inline.size} cross=${crossBatch.size}")
      streamed.foreach { case (k, c) =>
        assert(c == inline(k), s"cosine must match the batch path for $k") }
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming band probe fails fast when corpus growth changes the geometry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cdir = java.nio.file.Files.createTempDirectory("graft_geodrift").toString
    val emb = graft.engine.Tables(spark, Dir, "embeddings") // 500 rows -> 8-bit bands
    emb.write.parquet(s"$cdir/embeddings.parquet")
    val dirs = java.nio.file.Files.createTempDirectory("graft_geodrift_out").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = Similarity.streamingBandProbe(spark,
      in.toDF().toDF("vec_id", "embedding"), cdir,
      s"$dirs/pairs", s"$dirs/ckpt", histMax = 250)
    try {
      in.addData((500L, Array.fill(64)(0.1f)))
      q.processAllAvailable() // geometry unchanged: the batch commits
      assert(graft.engine.VersionedTable.versions(spark, s"$dirs/pairs") == Seq(0L))
      // grow the corpus across the 8->9-bit band boundary (500 -> 1500
      // vectors): the standing index's geometry is now stale and the
      // stream must refuse to probe it, not silently read wrong buckets
      Seq(500L, 1000L).foreach { off =>
        emb.withColumn("vec_id", col("vec_id") + off)
          .write.mode("append").parquet(s"$cdir/embeddings.parquet")
      }
      in.addData((501L, Array.fill(64)(0.2f)))
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("geometry drifted")),
        s"expected the geometry-drift fail-fast, got: $e")
    } finally q.stop()
  }

  test("banded probe join under a hot bucket: AQE skew split engages") {
    import spark.implicits._
    // a mostly-duplicated corpus (the real shape that makes one band
    // bucket hot): 50k copies of one vector + 10k random in the history,
    // 50 copies + 450 random in the increment. One 16-bit band keeps the
    // gate on a single join key distribution.
    val hot = graft.engine.Tables(spark, Dir, "embeddings")
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val rnd = new scala.util.Random(7)
    def noise() = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val corpus = ((0L until 50000L).map(i => (i, hot)) ++
      (50000L until 60000L).map(i => (i, noise())) ++
      (60000L until 60050L).map(i => (i, hot)) ++
      (60050L until 60500L).map(i => (i, noise())))
      .toDF("vec_id", "embedding")
    val keys = Similarity.srpBandKeysFor(spark, corpus, 16, 16)
      .select(col("vec_id"), (col("band") * 65536L + col("key")).as("bk"))
      .localCheckpoint(true)
    val hist = keys.filter(col("vec_id") < 60000)
      .select(col("bk"), col("vec_id").as("vec_a"))
    val incr = keys.filter(col("vec_id") >= 60000)
      .select(col("bk"), col("vec_id").as("vec_b"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "200k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "200k")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val qe = incr.join(hist, Seq("bk")).queryExecution
      val n = qe.toRdd.count()
      assert(n >= 50L * 50000L, s"the hot bucket must dominate the probe: $n")
      assert(qe.executedPlan.toString.contains("skew=true"),
        s"AQE must split the hot band bucket:\n${qe.executedPlan.toString.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("embedding dup clusters are consistent with the banded pair set") {
    val pairs = Similarity.bandedNearDup(spark, Dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Similarity.embeddingDupClusters(spark, Dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every near-dup pair lands in the same cluster
    pairs.foreach { case (x, y) =>
      assert(clusters(x)._1 == clusters(y)._1, s"pair ($x,$y) split across clusters")
    }
    // the cluster label is the member minimum and sizes match membership
    clusters.groupBy(_._2._1).foreach { case (lbl, members) =>
      assert(members.keySet.min == lbl)
      members.foreach { case (_, (_, size)) => assert(size == members.size) }
    }
  }

  test("ann scores candidates with exact cosine (subset consistency)") {
    val exact = Similarity.cosineTopk(spark, Dir)
      .select("query_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.annTopk(spark, Dir)
      .select("query_id", "vec_id", "cosine").collect()
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exact.get(key).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-15))
    }
  }

  test("SRP sketch is partitioning-invariant and uses only 32 bits") {
    val a = Similarity.srpSketch(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.srpSketch(spark, Sf).repartition(7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "quantized integer votes must not depend on partitioning")
    assert(a.values.forall(s => (s & ~((1L << Similarity.SrpBits) - 1)) == 0L))
    assert(a.values.toSet.size > 1, "sketches separate the fixture's vectors")
  }

  test("hard negatives never share the query's label and rank densely") {
    val rows = Similarity.hardNegatives(spark, Dir).collect()
    assert(rows.length == 20 * 10)
    rows.foreach { r =>
      assert(r.getAs[Int]("query_label") != r.getAs[Int]("neg_label"))
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("query_id"))
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
      // within a query the reported negatives are in non-increasing cosine
      val cs = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("int8 retrieval parity: integer ranking is stable and overlaps the float top-k") {
    val rows = Similarity.int8RetrievalParity(spark, Dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= r.getAs[Long]("k"))
    }
    // int8 at per-vector max-abs scale keeps most neighbors: the audit
    // must show real parity, not collapse (measured 7.4/10 mean here)
    val mean = rows.map(_.getAs[Long]("n_overlap")).sum.toDouble / rows.length
    assert(mean >= 5.0, s"mean top-10 overlap $mean under int8 quantization")
    // the integer ranking is exactly reproducible (ties broken by vec_id)
    val again = Similarity.int8RetrievalParity(spark, Dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("streaming hard negatives equal the batch miner, exactly-once per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val NumQ = 20
    val Split = 10L // queries arrive as [0,10) then [10,20)
    val qRows = graft.engine.Tables(spark, Dir, "embeddings")
      .filter(col("vec_id") < NumQ)
      .select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val dirs = java.nio.file.Files.createTempDirectory("graft_streamneg").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Array[Float])]
    val q = Similarity.streamingHardNegatives(spark,
      in.toDF().toDF("vec_id", "label", "embedding"), Dir,
      s"$dirs/negs", s"$dirs/ckpt")
    try {
      in.addData(qRows.filter(_._1 < Split).toSeq: _*)
      q.processAllAvailable()
      in.addData(qRows.filter(_._1 >= Split).toSeq: _*)
      q.processAllAvailable()
      val vs = graft.engine.VersionedTable.versions(spark, s"$dirs/negs")
      assert(vs == Seq(0L, 1L), s"one snapshot per micro-batch: $vs")
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"))
      def value(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("vec_id"), r.getAs[Int]("neg_label"), r.getAs[Double]("cosine"))
      val streamed = vs.flatMap { v =>
        graft.engine.VersionedTable.read(spark, s"$dirs/negs", Some(v))
          .collect().map(r => key(r) -> value(r))
      }.toMap
      // queries are corpus-independent (broadcast side only), so the
      // split must not change any ranking: per-batch union == one batch run
      val inline = Similarity.hardNegatives(spark, Dir, numQueries = NumQ)
        .collect().map(r => key(r) -> value(r)).toMap
      assert(streamed == inline,
        s"streamed=${streamed.size} inline=${inline.size}")
      // batch-0 replay must be a skipped commit, not a duplicate/overwrite
      graft.engine.VersionedTable.commitIfAbsent(
        Similarity.hardNegatives(spark, Dir, numQueries = 1), s"$dirs/negs", 0L)
      assert(graft.engine.VersionedTable.versions(spark, s"$dirs/negs") == Seq(0L, 1L))
      val replayed = graft.engine.VersionedTable.read(spark, s"$dirs/negs", Some(0L))
        .collect().map(r => key(r) -> value(r)).toMap
      assert(replayed == streamed.filter { case ((qid, _), _) => qid < Split },
        "replay must leave the committed batch-0 snapshot untouched")
    } finally q.stop()
  }

  test("dim ablation: full-width leg recovers the exact ranking verbatim") {
    val rows = Similarity.dimAblationRecall(spark, Dir).collect()
      .map(r => r.getAs[Long]("d") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))
      .toMap
    assert(rows.keySet == Set(8L, 16L, 32L, 64L))
    rows.values.foreach { case (ne, nh, rec) =>
      assert(ne == 200L && nh >= 0L && nh <= ne)
      assert(rec >= 0.0 && rec <= 1.0 && rec == nh.toDouble / ne.toDouble)
    }
    // slicing to the full width is the identity, so recall is exactly 1
    assert(rows(64L) == ((200L, 200L, 1.0)))
  }

  test("centroid outliers: LOO cosine is exact-integer derived and bounded") {
    val rows = Similarity.centroidOutliers(spark, Dir).collect()
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to g.length) && g.length <= 5)
      val cs = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("loo_cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a <= b }, "ascending by cosine")
      cs.foreach(c => assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
    }
    // partitioning invariance of the exact-integer pipeline
    val again = Similarity.centroidOutliers(spark, Dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("streaming drift monitor commits the batch core's frame exactly once per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = graft.engine.Tables(spark, Dir, "embeddings")
    val cut = base.agg(org.apache.spark.sql.functions.expr(
      "cast(max(vec_id) + 1 - (max(vec_id) - min(vec_id) + 1) div 4 as bigint)"))
      .collect()(0).getLong(0)
    val rows = base.filter(col("vec_id") >= cut)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val mid = cut + (rows.length / 2)
    val dirs = java.nio.file.Files.createTempDirectory("graft_streamdrift").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Array[Float])]
    val q = Similarity.streamingEmbeddingDrift(spark,
      in.toDF().toDF("vec_id", "label", "embedding"), Dir,
      s"$dirs/drift", s"$dirs/ckpt")
    try {
      in.addData(rows.filter(_._1 < mid).toSeq: _*)
      q.processAllAvailable()
      in.addData(rows.filter(_._1 >= mid).toSeq: _*)
      q.processAllAvailable()
      val vs = graft.engine.VersionedTable.versions(spark, s"$dirs/drift")
      assert(vs == Seq(0L, 1L), s"one snapshot per micro-batch: $vs")
      // each snapshot equals the batch core run on exactly that slice
      Seq(col("vec_id") >= cut && col("vec_id") < mid, col("vec_id") >= mid)
        .zip(vs).foreach { case (pred, v) =>
          val direct = Similarity.driftAgainstReference(spark, Dir,
            base.filter(pred).select("vec_id", "label", "embedding"))
            .collect().map(_.toString).toSeq
          val snap = graft.engine.VersionedTable.read(spark, s"$dirs/drift", Some(v))
            .orderBy("label").collect().map(_.toString).toSeq
          assert(snap == direct, s"snapshot $v diverges from the batch core")
        }
      // and the graded x135 frame is the full-quarter instance of the core
      val probe = Similarity.driftProbe(spark, Dir).collect().map(_.toString).toSeq
      val direct = Similarity.driftAgainstReference(spark, Dir,
        base.filter(col("vec_id") >= cut).select("vec_id", "label", "embedding"))
        .collect().map(_.toString).toSeq
      assert(probe == direct)
      // replay of batch 0 must be a skipped commit
      graft.engine.VersionedTable.commitIfAbsent(
        Similarity.driftProbe(spark, Dir), s"$dirs/drift", 0L)
      assert(graft.engine.VersionedTable.versions(spark, s"$dirs/drift") == Seq(0L, 1L))
    } finally q.stop()
  }

  test("x138: semdedup report ties out to the x57 cluster table and the corpus") {
    val rep = Similarity.semdedupReport(spark, Dir).collect()
    assert(rep.nonEmpty)
    val nVecs = spark.read.parquet(s"$Dir/embeddings.parquet").count()
    rep.foreach { r =>
      val size = r.getAs[Long]("cluster_size")
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_clusters") * size)
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_total"))
      assert(r.getAs[Long]("tokens_dropped") ==
        r.getAs[Long]("tokens_total") - r.getAs[Long]("tokens_kept"))
      if (size == 1L) assert(r.getAs[Long]("tokens_dropped") == 0L,
        "singletons drop nothing")
    }
    assert(rep.map(_.getAs[Long]("n_docs")).sum == nVecs,
      "every embedded doc appears in exactly one bucket")
    // non-singleton rows must agree with the x57 cluster table
    val x57 = Similarity.embeddingDupClusters(spark, Dir).collect()
    val bySize = x57.groupBy(_.getAs[Long]("cluster_size"))
      .map { case (k, g) => k -> g.length.toLong }
    rep.filter(_.getAs[Long]("cluster_size") > 1L).foreach { r =>
      assert(bySize(r.getAs[Long]("cluster_size")) == r.getAs[Long]("n_docs"))
    }
  }

  test("x137/x138 plan shapes: no cartesian corpus blowup, signs broadcast") {
    val jl = Similarity.jlDistortion(spark, Dir).queryExecution.executedPlan.toString
    assert(!jl.contains("CartesianProduct"), "JL audit must never go cartesian")
    assert(jl.contains("BroadcastHashJoin"), "the 64-row sign table must broadcast")
    val sd = Similarity.semdedupReport(spark, Dir).queryExecution.executedPlan.toString
    assert(!sd.contains("CartesianProduct"), "semdedup report must never go cartesian")
  }

  test("x137: JL distortion concentrates around 1 and tightens with width") {
    val rows = Similarity.jlDistortion(spark, Dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("mean_ratio"),
        r.getAs[Double]("min_ratio"), r.getAs[Double]("max_ratio"))).toMap
    assert(rows.keySet == Set(8L, 16L, 32L))
    val n = rows(8L)._1
    assert(rows.values.forall(_._1 == n), "same audit-pair set for every width")
    rows.foreach { case (k, (_, mean, lo, hi)) =>
      assert(lo > 0.0 && lo <= mean && mean <= hi, s"k=$k ordering")
      assert(mean > 0.5 && mean < 2.0, s"k=$k: E[ratio] ≈ 1 under JL, got $mean")
    }
    // the distortion envelope must tighten as k grows (JL concentration;
    // deterministic here because the sign matrix is content-derived)
    assert(rows(32L)._4 - rows(32L)._3 < rows(8L)._4 - rows(8L)._3,
      "k=32 spread should be tighter than k=8")
    // exact reproducibility: the whole pipeline is integer until the ratio
    val again = Similarity.jlDistortion(spark, Dir).collect()
    assert(again.map(_.toString).toSeq ==
      Similarity.jlDistortion(spark, Dir).collect().map(_.toString).toSeq)
    assert(again.map(_.toString).sorted.toSeq ==
      rows.toSeq.sortBy(_._1).map { case (k, (np, m, lo, hi)) =>
        org.apache.spark.sql.Row(k, np, m, lo, hi).toString }.sorted)
  }

  test("x146 binary retrieval matches a driver-side reference (sign pool + exact rescore)") {
    val rows = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def ham(a: Array[Float], b: Array[Float]): Long =
      a.indices.count(i => (a(i) > 0f) != (b(i) > 0f)).toLong
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val expected = rows.filter(_._1 < 20).flatMap { case (qid, qv) =>
      val pool = rows.filter(_._1 != qid)
        .map { case (id, v) => (ham(qv, v), id, v) }
        .sortBy(t => (t._1, t._2)).take(50)
      val top = pool.map { case (h, id, v) =>
          (dot(qv, v) / (nrm(qv) * nrm(v)), h, id)
        }.sortBy(t => (-t._1, t._3)).take(10)
      top.zipWithIndex.map { case ((c, h, id), i) => (qid, i + 1, id, h, c) }
    }
    val got = Similarity.binaryRetrieval(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === expected.toSeq)
    // the 1-bit pool must be doing real work: every returned candidate's
    // Hamming distance is within the pool's 50-candidate cut
    assert(got.forall(_._4 <= 64L))
  }

  test("x160 hubness audit matches a driver-side full-kNN reference") {
    val rows = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = rows.map { case (id, v) => (id, math.sqrt(dot(v, v))) }.toMap
    val occ = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    rows.foreach { case (qid, qv) =>
      rows.filter(_._1 != qid)
        .map { case (id, v) => (dot(qv, v) / (nrm(qid) * nrm(id)), id) }
        .sortBy(t => (-t._1, t._2)).take(10)
        .foreach { case (_, id) => occ(id) += 1L }
    }
    val full = rows.map(_._1).map(id => (id, occ(id)))
    val expTop = full.sortBy(t => (-t._2, t._1)).take(20)
    val nAnti = full.count(_._2 == 0L).toLong
    val maxOcc = full.map(_._2).max
    val got = Similarity.hubnessAudit(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(t => (t._2, t._3)).toSeq === expTop.toSeq)
    assert(got.forall(t => t._4 == nAnti && t._5 == maxOcc && t._6 == rows.length.toLong))
    // mass conservation: the k-occurrence distribution sums to n*k
    assert(full.map(_._2).sum === rows.length.toLong * 10L)
  }

  test("x185: power iteration converges to a unit eigendirection of the exact Gram") {
    val rows = Similarity.powerIteration(spark, Sf, iters = 60).collect()
    assert(rows.length === 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "loadings unit norm")
    val lambdaGrid = rows.head.getDouble(2)
    assert(lambdaGrid > 0.0)
    // eigen-residual: rebuild the same integer Gram independently and
    // check ||Gv - lambda*v|| << lambda (60 iterations close the
    // fixture's eigengap)
    import org.apache.spark.sql.functions._
    val cells = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(1048576.0))).as("qa"))
      .collect().map(_.getSeq[Long](0).toArray)
    val d = 64
    val g = Array.ofDim[Double](d, d)
    cells.foreach { q =>
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { g(i)(j) += (q(i) * q(j)).toDouble; j += 1 }
        i += 1
      }
    }
    val lambda = lambdaGrid * 1099511627776.0
    val gv = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
    val resid = math.sqrt(gv.zip(v).map { case (a, b) =>
      val e = a - lambda * b; e * e }.sum)
    assert(resid / lambda < 0.005,
      s"residual ${resid / lambda} — not an eigendirection")
    // determinism: a second run is bitwise identical
    val again = Similarity.powerIteration(spark, Sf, iters = 60).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(again.toSeq === v.toSeq)
    // x186: every projection reconstructs from the loadings and the
    // quantized vector (same pinned ascending-dim fold), and the
    // variance-explained ratio is sane
    val projs = Similarity.pcProjection(spark, Sf, iters = 60).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    assert(projs.size === cells.length)
    val q0 = cells.head // vec_id 0 is the first row of the fixture read? recompute:
    val byId = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    byId.take(5).foreach { case (id, e) =>
      var acc = 0.0
      var j = 0
      while (j < d) { acc += math.floor(e(j).toDouble * 1048576.0) * v(j); j += 1 }
      assert(projs(id)._1 === acc / 1048576.0, s"projection mismatch for vec $id")
    }
    val ve = projs.values.head._2
    assert(ve > 0.0 && ve <= 1.0, s"variance explained $ve out of range")
  }

  test("x24 block-pair budget: keep-all under it, pinned md5 sample over it, x219 reports it") {
    // graded scale: one block, grid of 1 pair, keep-all branch -> coverage 1.0
    val cov = Similarity.embeddingNearDupCoverage(spark, Dir).collect()(0)
    assert(cov.getLong(0) == 500L && cov.getLong(1) == 1L && cov.getLong(2) == 1L
      && cov.getLong(3) == 1L && cov.getDouble(4) == 1.0, s"keep-all datasheet: $cov")
    // a grid past the budget keeps a strict, deterministic subset
    val cov2 = Similarity.embeddingNearDupCoverage(spark, Dir,
      blockSize = 16, budget = 50L).collect()(0)
    assert(cov2.getLong(2) == 528L, s"32-block grid: $cov2") // 32*33/2
    assert(cov2.getLong(3) > 0L && cov2.getLong(3) < 528L, s"partial keep: $cov2")
    assert(cov2.getDouble(4) == cov2.getLong(3).toDouble / 528.0)
    val cov2b = Similarity.embeddingNearDupCoverage(spark, Dir,
      blockSize = 16, budget = 50L).collect()(0)
    assert(cov2.getLong(3) == cov2b.getLong(3), "the md5 draw is pinned")
    // the sampled KERNEL emits exactly the kept-block subset of the full
    // pair set: blockSize=1 makes blk == vec_id, grid = 125,250 pairs >
    // the 4096 budget, so the keep rule is recomputable per output pair
    def h15(sv: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(sv.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val total = 500L * 501L / 2L
    def keep(a: Long, b: Long): Boolean =
      (h15(s"x24bp:$a:$b") % 1000000L) * total < Similarity.MaxBlockPairs * 1000000L
    val full = Similarity.embeddingNearDup(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sampled = Similarity.embeddingNearDup(spark, Dir, blockSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = full.keySet.filter { case (a, b) => keep(a, b) }
    assert(sampled.keySet == expected,
      s"sampled kernel must equal the kept-block subset: got ${sampled.size}, want ${expected.size}")
    sampled.foreach { case (k, c) => assert(c == full(k), s"cosine differs for $k") }
  }
}
