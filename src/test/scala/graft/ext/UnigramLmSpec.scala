package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UnigramLm gate: the Spark trainer vs an INDEPENDENT in-memory
  * brute-force trainer (exhaustive segmentation enumeration — no DP, no
  * shared code), on crafted word histograms that exercise the tie-break,
  * the coverage floor, the seed prune, and the word-length cap.
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------
  // Brute-force reference: enumerate EVERY segmentation into pieces of
  // length 1..MaxPieceLen, score by left-to-right double product of
  // p(piece), pick min (negscore, path) — the same total order the engine
  // claims, arrived at without a DP.
  // ------------------------------------------------------------------

  private type Model = Map[String, Long]

  private def segmentationsOf(w: String): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap { l =>
      segmentationsOf(w.substring(l)).map(rest => w.substring(0, l) +: rest)
    }

  private def viterbiBrute(w: String, model: Model): (Double, String) = {
    val total = model.values.sum.toDouble
    val scored = segmentationsOf(w).flatMap { pieces =>
      if (pieces.forall(model.contains)) {
        val neg = pieces.foldLeft(-1.0)((acc, p) => acc * (model(p).toDouble / total))
        Some((neg, pieces.mkString(" ")))
      } else None
    }
    scored.min // Ordering[(Double, String)]: negscore asc = prob desc, then path asc
  }

  private def seedBrute(words: Map[String, Long]): (Model, Model) = {
    val chars = words.toSeq
      .flatMap { case (w, f) => w.map(c => (c.toString, f)) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val multi = words.toSeq
      .flatMap { case (w, f) =>
        for {
          i <- 0 until w.length
          l <- 2 to UnigramLm.MaxPieceLen if i + l <= w.length
        } yield (w.substring(i, i + l), f)
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .take(UnigramLm.SeedMultiVocab).toMap
    (chars, multi)
  }

  private def trainBrute(wordsAll: Map[String, Long],
      rounds: Int): (Model, Map[String, String]) = {
    val words = wordsAll.filter { case (w, _) =>
      w.nonEmpty && w.length <= UnigramLm.MaxWordLen }
    val (chars, multi) = seedBrute(words)
    var model: Model = chars ++ multi
    var segs = Map.empty[String, String]
    for (_ <- 1 to rounds) {
      segs = words.keys.map(w => w -> viterbiBrute(w, model)._2).toMap
      val used = segs.toSeq
        .flatMap { case (w, path) => path.split(" ").toSeq.map(p => (p, words(w))) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      model = used.filter { case (p, _) => p.length >= 2 } ++
        chars.keys.map(c => c -> used.getOrElse(c, 1L))
    }
    (model, segs)
  }

  private def sparkTrain(words: Map[String, Long], rounds: Int)
      : (Map[String, Long], Map[String, String]) = {
    val wordsDf = words.toSeq.toDF("w", "freq")
      .filter(length(col("w")).between(1, UnigramLm.MaxWordLen))
    val (pieces, seg) = UnigramLm.trainFromWords(wordsDf, rounds)
    (pieces.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      seg.select("w", "segmentation").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap)
  }

  test("engine matches the brute-force trainer on a mixed corpus, 3 rounds") {
    val words = Map("international" -> 7L, "internet" -> 11L, "nation" -> 9L,
      "natural" -> 4L, "interval" -> 2L, "rate" -> 13L, "eat" -> 5L,
      "tea" -> 5L, "ate" -> 5L)
    val (bm, bs) = trainBrute(words, 3)
    val (sm, ss) = sparkTrain(words, 3)
    assert(sm === bm)
    assert(ss === bs)
  }

  test("exact score ties break on the lexicographically smaller path") {
    // Crafted so p("aa") == p("a")^2 exactly at round 1: seed counts are
    // a=4 (two per "aa" occurrence × freq 2), aa=2, b=2 → total 8,
    // p(aa)=0.25 == 0.5^2. The tie must fall to "a a" (space < 'a').
    val words = Map("aa" -> 2L, "b" -> 2L)
    val (_, bs) = trainBrute(words, 1)
    val (_, ss) = sparkTrain(words, 1)
    assert(bs("aa") === "a a")
    assert(ss === bs)
  }

  test("coverage floor: a char squeezed out of every path keeps count 1") {
    // "ab" always segments as the whole piece "ab" once its count wins,
    // so chars a/b go unused — they must survive at count 1, and the
    // unused multi-char candidates must be pruned.
    val words = Map("ab" -> 50L)
    val (bm, _) = trainBrute(words, 2)
    val (sm, _) = sparkTrain(words, 2)
    assert(sm === bm)
    assert(sm("a") === 1L && sm("b") === 1L && sm("ab") === 50L)
  }

  test("words over MaxWordLen are excluded; the rest train unaffected") {
    val long = "x" * (UnigramLm.MaxWordLen + 1)
    val (bm, bs) = trainBrute(Map("abc" -> 3L, long -> 99L), 2)
    val (sm, ss) = sparkTrain(Map("abc" -> 3L, long -> 99L), 2)
    assert(!ss.contains(long) && !bs.contains(long))
    assert(sm === bm && ss === bs)
    val (bmRef, _) = trainBrute(Map("abc" -> 3L), 2)
    assert(bm === bmRef)
  }

  test("single-char word and piece-length boundary (MaxPieceLen exact)") {
    val w4 = "wxyz" // exactly MaxPieceLen — must be a candidate piece
    val (bm, bs) = trainBrute(Map(w4 -> 6L, "q" -> 1L), 2)
    val (sm, ss) = sparkTrain(Map(w4 -> 6L, "q" -> 1L), 2)
    assert(sm === bm && ss === bs)
    assert(ss(w4) === w4) // whole-word piece wins at freq 6
    assert(ss("q") === "q")
  }
}
