package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ExactSubstr lane (x161–x163) against PLANTED corpora — the pinned
  * testdata fixtures are degenerate in ways that could make these gates
  * vacuous (31-token vocabulary, single-line docs), so every guarantee
  * is exercised on synthetic documents with hand-computable answers:
  * the suffix array against an in-memory brute-force sort (including
  * cross-doc FULL-duplicate docs, whose suffixes tie in content and
  * must break by doc_id), spans against hand-derived maximal intervals
  * (including touching-window merges), and the scrub against a
  * hand-assembled survivor string.
  */
class SuffixDedupSpec extends SparkSpec {

  /** Write docs as a documents.parquet table in a temp dir. */
  private def plant(docs: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd").toString
    import spark.implicits._
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** In-memory brute-force suffix array: suffixes ordered by token
    * content (lexicographic, shorter-prefix-first), ties by doc_id.
    */
  private def bruteSa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val suf = docs.flatMap { case (id, text) =>
      val w = text.trim.toLowerCase.split("\\s+").toSeq
      w.indices.map(p => (id, p.toLong, w.drop(p)))
    }
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits.seqOrdering
    suf.sortBy { case (id, _, toks) => (toks, id) }
      .zipWithIndex.map { case ((id, p, _), i) => (id, p, i.toLong) }
      .sortBy(x => (x._1, x._2))
  }

  private def gotSa(dir: String): Seq[(Long, Long, Long)] =
    SuffixDedup.suffixArrayDump(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("suffix array equals the brute-force sort on a planted corpus") {
    // shared 9-token run across docs 1/2, a self-repeat inside doc 3,
    // a short doc, and overlapping-run stress ("a a a ...")
    val docs = Seq(
      (1L, "q1 q2 c d e f g h i j k b1 b2"),
      (2L, "x1 x2 c d e f g h i j k y1"),
      (3L, "m1 r s t m2 r s t m3"),
      (4L, "c d e"),
      (5L, "a a a a a a a"))
    assert(gotSa(plant(docs)) === bruteSa(docs))
  }

  test("content-identical cross-doc suffixes (full-dup docs) break by doc_id") {
    // doc 7 is an exact copy of doc 6; doc 8 shares only a tail. Every
    // doc-6 suffix ties a doc-7 suffix in content — the dense index
    // must order each tie 6-before-7 (the oracle's ORDER BY suffix,
    // doc_id), and the result must still be a permutation of 0..n-1.
    val docs = Seq(
      (6L, "u v w p q r s t"),
      (7L, "u v w p q r s t"),
      (8L, "z1 z2 p q r s t"))
    val got = gotSa(plant(docs))
    assert(got === bruteSa(docs))
    assert(got.map(_._3).sorted === (0L until got.size.toLong))
    // spot the tie-break: the full-doc suffixes at pos 0
    val sa6 = got.find(x => x._1 == 6L && x._2 == 0L).get._3
    val sa7 = got.find(x => x._1 == 7L && x._2 == 0L).get._3
    assert(sa6 + 1 == sa7, "doc 6's copy must immediately precede doc 7's")
  }

  test("suffix array on the pinned fixture is a permutation (driver gate twin)") {
    val sas = SuffixDedup.suffixArrayDump(spark, Sf)
      .select(col("sa")).collect().map(_.getLong(0)).sorted
    assert(sas === Array.tabulate(sas.length)(_.toLong))
  }

  test("SA-adjacency covered set equals the brute-force gram-count covered set") {
    // two independent paths to "this position starts a duplicated
    // L-gram": the engine's suffix-array neighbor test vs a literal
    // gram groupBy — on the real fixture, where chance repeats abound
    val L = SuffixDedup.MinMatchTokens
    val viaSa = SuffixDedup.coveredPositions(spark, Sf, L)
      .select(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val grams = SuffixDedup.gramAt(spark, Sf, L)
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    val viaCount = grams.join(dupGrams, Seq("gram"))
      .select(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSa.nonEmpty, "fixture must exercise the lane (vacuity guard)")
    assert(viaSa === viaCount)
  }

  test("spans merge overlapping and touching windows into maximal intervals") {
    // doc 21 repeats doc 20's tokens 0..9 (two overlapping 8-windows at
    // pos 0,1,2 -> one span [0,10)) and separately tokens 20..27 (one
    // window -> span [20,28)); doc 22 carries the same second run so it
    // is cross-doc everywhere
    val run1 = (0 until 10).map(i => s"r$i").mkString(" ")
    val run2 = (0 until 8).map(i => s"s$i").mkString(" ")
    def noise(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (20L, s"$run1 ${noise("a", 10)} $run2 ${noise("b", 4)}"),
      (21L, s"${noise("c", 5)} $run1 ${noise("d", 7)} $run2"),
      (22L, s"${noise("e", 3)} $run2 ${noise("f", 9)}"))
    val dir = plant(docs)
    val got = SuffixDedup.exactSubstrSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    val expected = Seq(
      // doc 20: run1 at 0..9 (windows 0,1,2), run2 at 20..27 (window 20)
      (20L, 0L, 10L, 10L, 3L, true),
      (20L, 20L, 28L, 8L, 1L, true),
      // doc 21: run1 at 5..14, run2 at 22..29
      (21L, 5L, 15L, 10L, 3L, true),
      (21L, 22L, 30L, 8L, 1L, true),
      // doc 22: run2 at 3..10
      (22L, 3L, 11L, 8L, 1L, true))
    assert(got === expected)
  }

  test("scrub cuts exactly the span-union tokens and hashes the survivors") {
    val run = (0 until 8).map(i => s"k$i").mkString(" ")
    val docs = Seq(
      (30L, s"pre1 pre2 $run post1"),
      (31L, s"$run tail1 tail2"),
      (32L, "solo1 solo2 solo3 solo4 solo5 solo6 solo7 solo8 solo9"))
    val dir = plant(docs)
    val got = SuffixDedup.exactSubstrScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val expected = Seq(
      (30L, 11L, 8L, 3L, md5hex("pre1 pre2 post1")),
      (31L, 10L, 8L, 2L, md5hex("tail1 tail2")),
      (32L, 9L, 0L, 9L,
        md5hex("solo1 solo2 solo3 solo4 solo5 solo6 solo7 solo8 solo9")))
    assert(got === expected)
  }

  test("a fully-duplicated document scrubs to the empty string") {
    val body = (0 until 12).map(i => s"w$i").mkString(" ")
    val dir = plant(Seq((40L, body), (41L, body)))
    val got = SuffixDedup.exactSubstrScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(got.toSeq === Seq((40L, 12L, 0L, emptyMd5), (41L, 12L, 0L, emptyMd5)))
  }

  test("LCP straddle: curve is exact when shared runs sit exactly at each CurveL boundary") {
    // one full-dup doc pair per run length, lengths chosen to straddle
    // every CurveL (7|8, 15|16, 31|32) plus one run CROSSING the LcpCap
    // (40 > 33): the capped lcp must still pass every consumed L, and
    // counts must stay exact. A 20-token singleton keeps
    // n_window_starts distinguishable from n_covered_starts.
    def run(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val lens = Seq("a" -> 7, "b" -> 8, "c" -> 15, "d" -> 16,
      "e" -> 31, "f" -> 32, "g" -> 40)
    val docs = lens.zipWithIndex.flatMap { case ((tag, n), i) =>
      Seq((2L * i, run(tag, n)), (2L * i + 1, run(tag, n)))
    } :+ ((99L, run("solo", 20)))
    val dir = plant(docs)
    // the cap is actually exercised: the 40-run pair's pos-0 suffixes
    // share 40 tokens, stored as LcpCap
    val maxLcp = SuffixDedup.suffixArray(spark, dir)
      .agg(max(col("lcp_next"))).head().getLong(0)
    assert(maxLcp === 33L)
    val rows = SuffixDedup.dupRateCurve(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    // per full-dup pair of run length R: starts(L) = 2*max(0, R-L+1),
    // cut(L) = 2*R if R >= L else 0; singleton contributes starts only
    def expect(l: Int) = {
      val starts = lens.map(_._2).map(n => 2 * math.max(0, n - l + 1)).sum +
        math.max(0, 20 - l + 1)
      val covered = lens.map(_._2).map(n => 2 * math.max(0, n - l + 1)).sum
      val cut = lens.map(_._2).filter(_ >= l).map(2 * _).sum
      (starts.toLong, covered.toLong, cut.toLong)
    }
    for (l <- Seq(8, 16, 32)) {
      val (starts, covered, cut) = expect(l)
      val r = rows(l)
      assert(r.getAs[Long]("n_positions") === 318L)
      assert(r.getAs[Long]("n_window_starts") === starts, s"starts at L=$l")
      assert(r.getAs[Long]("n_covered_starts") === covered, s"covered at L=$l")
      assert(r.getAs[Long]("n_cross_doc_starts") === covered, s"cross at L=$l")
      assert(r.getAs[Long]("n_cut_tokens") === cut, s"cut at L=$l")
    }
    assert(rows(8).getAs[Long]("n_covered_starts") === 200L)
    assert(rows(32).getAs[Long]("n_cut_tokens") === 144L)
  }

  test("x174: dup-rate curve is exact on a planted run and monotone in L") {
    val run = (0 until 20).map(i => s"r$i").mkString(" ")
    val dir = plant(Seq(
      (50L, s"${(0 until 6).map(i => s"a$i").mkString(" ")} $run"),
      (51L, s"$run ${(0 until 6).map(i => s"b$i").mkString(" ")}"),
      (52L, (0 until 15).map(i => s"c$i").mkString(" "))))
    val rows = SuffixDedup.dupRateCurve(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet === Set(8, 16, 32))
    assert(rows(8).getAs[Long]("n_positions") === 67L)
    // the 20-token cross-doc run: 13 window starts per doc at L=8,
    // 5 at L=16, none at L=32 (no 32-window fits any document)
    assert(rows(8).getAs[Long]("n_covered_starts") === 26L)
    assert(rows(8).getAs[Long]("n_cross_doc_starts") === 26L)
    assert(rows(8).getAs[Long]("n_cut_tokens") === 40L)
    assert(rows(16).getAs[Long]("n_covered_starts") === 10L)
    assert(rows(16).getAs[Long]("n_cut_tokens") === 40L)
    assert(rows(32).getAs[Long]("n_window_starts") === 0L)
    assert(rows(32).getAs[Long]("n_cut_tokens") === 0L)
    assert(rows(8).getAs[Double]("cut_rate") === 40.0 / 67.0)
    // the fixture corpus: covered starts and cut tokens can only shrink
    // as L doubles (an L-covered position is 2L-covered's subwindow)
    val fx = SuffixDedup.dupRateCurve(spark, Sf).collect()
      .sortBy(_.getInt(0))
    fx.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_covered_starts") <= a.getAs[Long]("n_covered_starts"))
      assert(b.getAs[Long]("n_cut_tokens") <= a.getAs[Long]("n_cut_tokens"))
    }
  }
}
