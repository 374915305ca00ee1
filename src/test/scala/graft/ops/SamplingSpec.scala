package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling contracts: membership is a pure function of
  * the key (partitioning-invariant), splits are disjoint and exhaustive,
  * and realized fractions track the configured rates.
  */
class SamplingSpec extends SparkSpec {

  test("split membership is partitioning-invariant and repeatable") {
    val a = Sampling.hashSplit(spark, Sf).collect().map(r => (r.getLong(0), r.getString(2)))
    val b = Sampling.hashSplit(spark, Sf).repartition(7).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(a.toSet == b.toSet)
  }

  test("PPS sample matches a brute-force prefix sum and is partitioning-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val weights = (0L until 400L).map(i => i -> (1L + rng.nextInt(500).toLong))
    val k = 25
    // brute force: exact integer systematic sampling on the driver
    val total = weights.map(_._2).sum
    val step = total / k
    var cum = 0L
    val expected = weights.flatMap { case (id, w) =>
      val before = cum; cum += w
      val picks = cum / step - before / step
      if (picks > 0) Some((id, w, cum, picks)) else None
    }
    def run(parts: Int) = Sampling.ppsSampleOf(
      weights.toDF("doc_id", "w").repartition(parts), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val out = run(5)
    assert(out == expected, s"got ${out.take(5)}... want ${expected.take(5)}...")
    assert(run(1) == expected && run(32) == expected,
      "the two-phase scan must not depend on input partitioning")
    // total picks is the boundary count, ~k by construction
    assert(out.map(_._4).sum == total / step)
  }

  test("PPS plan never windows the corpus in a single partition") {
    // the scale claim, plan-gated: the CORPUS cumulative-sum window must
    // be keyed by pid (hashpartitioning), never SinglePartition. Two
    // SinglePartition exchanges are expected and harmless — both feed
    // aggregate-sized frames (the per-partition offsets window and the
    // one-row step scalar), not the corpus.
    val plan = Sampling.ppsSample(spark, Sf).queryExecution.executedPlan.toString
    val singleParts = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singleParts <= 2, s"only the two tiny frames may serialize:\n$plan")
    assert("Exchange hashpartitioning\\(pid".r.findAllIn(plan).nonEmpty,
      s"the corpus window must be keyed by pid:\n$plan")
    // the corpus-side window really is the pid-keyed one: the only
    // window spec partitioned by an empty list must sit above an
    // aggregate (the offsets frame), which the pid grouping guarantees
    assert(plan.contains("windowspecdefinition(pid"),
      s"corpus cumsum rides the per-partition window:\n$plan")
  }

  test("PPS picks are weight-proportional: heavy docs are never skipped") {
    import spark.implicits._
    // one doc owns >2 steps of weight: it must be picked >= 2 times
    val weights = Seq((0L, 10L), (1L, 10L), (2L, 2000L), (3L, 10L), (4L, 10L))
    val out = Sampling.ppsSampleOf(weights.toDF("doc_id", "w"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(2L) >= 2, s"the dominant-weight doc multi-picks: $out")
  }

  test("splits are disjoint, exhaustive, and near the 80/10/10 rates") {
    val counts = Sampling.hashSplit(spark, Sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val docs = graft.engine.Tables(spark, Sf, "documents").count()
    assert(total == docs, "every document lands in exactly one split")
    val trainFrac = counts.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.68 && trainFrac < 0.92,
      s"train fraction $trainFrac far from 0.8 (50-doc fixture tolerance)")
  }

  test("stratified sample keeps only rows under their language's rate") {
    val kept = Sampling.stratifiedSample(spark, Sf).collect()
    kept.foreach { r =>
      val cap = if (r.getString(1) == "en") 50 else 20
      assert(r.getLong(2) < cap, s"row ${r.getLong(0)} exceeds its stratum cap")
    }
    assert(kept.nonEmpty)
  }

  test("mixtureRebalance fills each group quota exactly and deterministically") {
    val rows = Sampling.mixtureRebalance(spark, Sf).collect()
    assert(rows.nonEmpty)
    val groups = rows.groupBy(r => (r.getString(1), r.getString(2)))
    val nGroups = groups.size
    val total = rows.length
    val budgetPerGroup = math.ceil(total.toDouble * 0.6 / nGroups).toLong
    groups.foreach { case (_, grp) =>
      val quota = grp.head.getAs[Long]("quota")
      assert(quota == math.min(grp.length.toLong, budgetPerGroup))
      assert(grp.count(_.getAs[Boolean]("keep")) == quota,
        "kept rows per group must equal the quota")
      // within a group, kept rows are exactly the lowest-ranked ones
      val keptRanks = grp.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("rnk")).sorted
      assert(keptRanks.sameElements(1L to quota))
    }
    // pure function of the key: a second run keeps the identical doc set
    val again = Sampling.mixtureRebalance(spark, Sf).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    assert(again == rows.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet)
  }

  test("global shuffle is a permutation with contiguous per-shard positions") {
    val out = Sampling.globalShuffle(spark, Sf).collect()
    val docs = graft.engine.Tables(spark, Sf, "documents").count()
    assert(out.length.toLong == docs, "every doc appears")
    assert(out.map(_.getLong(0)).distinct.length == out.length, "exactly once")
    val byShard = out.groupBy(_.getLong(1))
    assert(byShard.size > 1, "docs spread over multiple shards")
    byShard.foreach { case (sh, rows) =>
      val ps = rows.map(_.getLong(2)).sorted.toSeq
      assert(ps == (1L to ps.length.toLong), s"shard $sh positions not contiguous: $ps")
    }
    // pure function of the key: stable across runs and repartitionings
    val again = Sampling.globalShuffle(spark, Sf).repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("temperature mixture flattens shares and fills quotas exactly") {
    val out = Sampling.temperatureMixture(spark, Sf).collect()
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val n = rows.head.getLong(2)
      val target = rows.head.getLong(3)
      val kept = rows.count(_.getBoolean(4)).toLong
      assert(kept == math.min(target, n), s"$lang keeps min(target, n)")
      assert(target >= 1L, s"$lang never starves entirely")
    }
    // alpha = 0.5 flattens the mixture: the smallest language keeps at
    // least as large a FRACTION of itself as the largest language does
    val fracs = byLang.values.map { rows =>
      (rows.head.getLong(2), rows.count(_.getBoolean(4)).toDouble / rows.head.getLong(2))
    }.toSeq
    assert(fracs.minBy(_._1)._2 >= fracs.maxBy(_._1)._2 - 1e-9)
  }

  test("packed sequences conserve tokens, tile bins contiguously, fill non-final bins exactly") {
    val out = Sampling.packedSequences(spark, Sf).collect()
    val docs = graft.engine.Tables(spark, Sf, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // conservation: a split doc's takes sum back to its token count
    out.groupBy(_.getLong(2)).foreach { case (d, rows) =>
      assert(rows.map(_.getLong(4)).sum == docs(d), s"doc $d loses tokens across bins")
    }
    val bySplitBin = out.groupBy(r => (r.getString(0), r.getLong(1)))
    bySplitBin.foreach { case ((sp, b), rows) =>
      // contiguous tiling: offsets chain with no gap or overlap
      var pos = 0L
      rows.sortBy(_.getLong(3)).foreach { r =>
        assert(r.getLong(3) == pos, s"gap at offset ${r.getLong(3)} in bin ($sp,$b)")
        pos += r.getLong(4)
      }
      // every non-final bin is EXACTLY full — the fixed-shape batch property
      val lastBin = bySplitBin.keys.collect { case (`sp`, bb) => bb }.max
      if (b < lastBin) assert(pos == 4096L, s"bin ($sp,$b) not exactly full: $pos")
      else assert(pos <= 4096L)
    }
    // splitting really happens on this fixture (some doc spans 2+ bins)
    assert(out.groupBy(_.getLong(2)).exists(_._2.length > 1), "no doc was ever split")
  }

  test("salted enrich join equals the plain join row-for-row") {
    val salted = Skew.saltedEnrichJoin(spark, Sf).collect().toSeq
    val ev = graft.engine.Tables(spark, Sf, "events")
    val dim = ev.groupBy(col("user_id")).agg(
      count(lit(1)).as("user_n_events"), max(col("value")).as("user_max_value"))
    val plain = ev.select(col("event_id"), col("user_id"), col("value"))
      .join(dim, "user_id")
      .select(col("event_id"), col("user_id"), col("value"),
        col("user_n_events"), col("user_max_value"))
      .orderBy(col("event_id")).collect().toSeq
    assert(salted == plain)
  }

  test("x132: token-budget allocation matches a driver brute force and respects the cap") {
    val rows = Sampling.tokenBudget(spark, Sf).collect()
    assert(rows.nonEmpty)
    val per = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        src -> rs.map(_.getString(1).trim.split("\\s+").length.toLong).sum
      }
    val nSrc = per.size.toLong
    val uTotal = per.values.sum
    val alloc0 = (3L * uTotal) / nSrc
    val capped = per.map { case (s, u) => s -> math.min(alloc0, 4L * u) }
    val leftover = per.keys.map(s => alloc0 - capped(s)).sum
    val headroom = per.map { case (s, u) => s -> (4L * u - capped(s)) }
    val hrTotal = headroom.values.sum
    rows.foreach { r =>
      val src = r.getString(0)
      val u = per(src)
      assert(r.getAs[Long]("unique_tokens") == u)
      assert(r.getAs[Long]("alloc0") == alloc0)
      assert(r.getAs[Long]("capped_alloc") == capped(src))
      val extra = if (hrTotal > 0)
        math.min(headroom(src), leftover * headroom(src) / hrTotal) else 0L
      assert(r.getAs[Long]("extra_alloc") == extra, s"$src extra")
      val fin = capped(src) + extra
      assert(r.getAs[Long]("final_alloc") == fin)
      assert(fin <= 4L * u, s"$src: epoch cap must hold after redistribution")
      assert(r.getAs[Double]("epochs") == fin.toDouble / u.toDouble)
    }
    // nothing over-allocated: the budget is an upper bound
    assert(rows.map(_.getAs[Long]("final_alloc")).sum <= 3L * uTotal)
  }
}
