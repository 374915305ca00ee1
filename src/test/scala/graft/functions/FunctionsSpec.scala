package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contracts for the custom extension surface: the native ParsePoint
  * expression (eval + codegen agreement, malformed-input NULLs) and the
  * TopKAgg typed aggregator (equivalence with the window spelling).
  */
class FunctionsSpec extends SparkSpec {

  test("parse_point parses valid points and NULLs malformed input") {
    ParsePoint.register(spark)
    import spark.implicits._
    val df = Seq(
      "(37.906111,55.408611)",
      "(-0.5,12.25)",
      "garbage",
      "(1.0)",
      "(a,b)",
      null
    ).toDF("c").select(col("c"), expr("parse_point(c)").as("p"))
    val got = df.select(col("p.lon"), col("p.lat")).collect()
      .map(r => if (r.isNullAt(0)) None else Some((r.getDouble(0), r.getDouble(1))))
    assert(got.toSeq == Seq(
      Some((37.906111, 55.408611)),
      Some((-0.5, 12.25)),
      None, None, None, None))
  }

  test("parse_point agrees between interpreted eval and codegen") {
    ParsePoint.register(spark)
    import spark.implicits._
    val data = Seq("(1.5,-2.5)", "(0.0,0.0)", "bad", "(9,9)")
    val df = data.toDF("c")
    val viaCodegen = df.select(expr("parse_point(c)").as("p"))
      .select(col("p.lon")).collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    val viaEval = data.map { s =>
      val r = ParsePoint.parseOrNull(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      if (r == null) null else r.getDouble(0)
    }
    assert(viaCodegen == viaEval)
  }

  test("parse_point matches the regexp_extract spelling on the fixtures") {
    ParsePoint.register(spark)
    val pt = "^\\(([^,]+),([^)]+)\\)$"
    val ap = graft.flights.Fixtures.df(spark, graft.flights.Fixtures.airportsData)
    val native = ap.select(col("airport_code"), expr("parse_point(coordinates).lon").as("lon"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val regex = ap.select(col("airport_code"),
      regexp_extract(col("coordinates"), pt, 1).cast("double").as("lon"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(native == regex)
  }

  test("BpeTokenCount equals size(regexp_extract_all) on real text and edge cases") {
    import spark.implicits._
    val edge = Seq(
      "", "   ", "abc", "abc123", "a1b2", "hello, world! 42",
      "tabs\tand\nnewlinesform\ffeeds\rhere",
      "unicode éé café 中文 😀 mix3d",
      "!!!", "a-b_c.d").toDF("text")
    val docs = graft.engine.Tables(spark, Sf, "documents").select("text")
    val all = edge.unionByName(docs)
    val mismatch = all.select(
      graft.ext.TextAnalysis.bpeTokenCountCol(col("text")).as("native"),
      size(graft.ext.TextAnalysis.bpeTokens(col("text"))).as("regex"))
      .filter(col("native") =!= col("regex")).count()
    assert(mismatch == 0, "native count must match the regex spelling")
    assert(BpeTokenCount.count(null) == 0)
  }

  test("CanonicalAlnum equals the regexp_replace spelling on real text") {
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = graft.engine.Tables(spark, Sf, "documents")
    val native = docs.select(col("doc_id"),
      ColumnBridge.column(CanonicalAlnum(ColumnBridge.expression(col("text")))).as("c"))
    val regex = docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("c"))
    assert(native.exceptAll(regex).isEmpty && regex.exceptAll(native).isEmpty)
  }

  test("CanonicalAlnum handles multibyte, empty and null input") {
    import org.apache.spark.sql.graft.ColumnBridge
    import spark.implicits._
    val got = Seq("Héllo, Wörld! 42", "", "日本語テキスト", null, "ABC")
      .toDF("s")
      .select(ColumnBridge.column(CanonicalAlnum(ColumnBridge.expression(col("s")))))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("hllowrld42", "", "", null, "abc"))
  }

  test("NfcNormalize composes, is idempotent, and keeps ASCII byte-identical") {
    import org.apache.spark.sql.graft.ColumnBridge
    import spark.implicits._
    def nfc(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
    val decomposed = "café"       // e + combining acute
    val composed = "café"          // precomposed é
    val rows = Seq(decomposed, composed, "plain ascii", "", null,
      "Ångström")           // Å (A+ring) + ö (o+diaeresis)
      .toDF("s")
      .select(nfc(col("s")).as("n"), length(col("s")).as("lr"), length(nfc(col("s"))).as("ln"))
      .collect()
    assert(rows(0).getString(0) == composed && rows(0).getInt(1) == 5 && rows(0).getInt(2) == 4,
      "decomposed input composes and loses the combining mark")
    assert(rows(1).getString(0) == composed, "already-NFC input is unchanged")
    assert(rows(2).getString(0) == "plain ascii" && rows(3).getString(0) == "")
    assert(rows(4).isNullAt(0), "null propagates")
    assert(rows(5).getString(0) == "Ångström",
      "multiple combining marks compose independently")
    // the JDK normalizer agrees with itself under double application
    assert(java.text.Normalizer.normalize(rows(5).getString(0),
      java.text.Normalizer.Form.NFC) == rows(5).getString(0))
  }

  test("DotD is bitwise-identical to the interpreted HOF fold, incl. edges") {
    import graft.ext.Similarity
    // every corpus pair shape: self-dot over the real embeddings
    val both = graft.engine.Tables(spark, Sf, "embeddings")
      .select(col("vec_id"),
        Similarity.dotD(col("embedding"), col("embedding")).as("native"),
        Similarity.dotDHof(col("embedding"), col("embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
        == java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"fold mismatch for vec ${r.getLong(0)}")
    }
    // edge semantics match the zip_with+aggregate spelling: unequal
    // lengths and null elements poison to NULL; empty arrays fold to 0.0
    import spark.implicits._
    val edges = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(1.0f), Array(1.0f, 2.0f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
      .select(Similarity.dotD(col("a"), col("b")).as("native"),
        Similarity.dotDHof(col("a"), col("b")).as("hof"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(edges(0) == (Some(11.0), Some(11.0)), s"plain dot: ${edges(0)}")
    assert(edges(1) == ((None, None)), s"unequal lengths poison to NULL: ${edges(1)}")
    assert(edges(2) == (Some(0.0), Some(0.0)), s"empty arrays fold to 0.0: ${edges(2)}")
  }

  test("dot_d SQL builder rejects wrong arity with a named error") {
    DotD.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT dot_d(array(CAST(1.0 AS FLOAT)))").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("dot_d") && m.contains("2 arguments")),
      s"expected an arity error naming dot_d, got: $e")
  }

  test("LshBuckets with equal-content tensors canonicalize equal") {
    def planes() = Array(Array(Array(0.5, -0.25), Array(1.0, 2.0)))
    import org.apache.spark.sql.graft.ColumnBridge
    val c = ColumnBridge.expression(col("embedding"))
    val a = LshBuckets(c, planes())
    val b = LshBuckets(c, planes())
    assert(a == b && a.hashCode == b.hashCode,
      "content-equal plane tensors must compare equal (subexpression elimination)")
    assert(a != LshBuckets(c, Array(Array(Array(9.0, 0.0)))))
  }

  test("dot_l / sqdist_l equal the interpreted HOF spelling and keep ANSI overflow") {
    import org.apache.spark.sql.graft.ColumnBridge
    graft.functions.LongVec.register(spark)
    def dotL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.DotL(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
    def sqL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.SqDistL(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
    val grid = graft.engine.Tables(spark, Sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1048576.0)).cast("long")).as("qa"))
    val rows = grid.select(
        dotL(col("qa"), col("qa")).as("nat_dot"),
        aggregate(zip_with(col("qa"), col("qa"), (x, y) => x * y),
          lit(0L), (a, v) => a + v).as("hof_dot"),
        sqL(col("qa"), expr("reverse(qa)")).as("nat_sq"),
        aggregate(zip_with(col("qa"), expr("reverse(qa)"),
          (x, y) => (x - y) * (x - y)), lit(0L), (a, v) => a + v).as("hof_sq"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
    // length mismatch -> NULL, like zip_with's null padding poisoning the fold
    val mism = spark.sql(
      "SELECT dot_l(array(1L, 2L), array(1L)) AS d").collect().head
    assert(mism.isNullAt(0))
    // overflow raises instead of wrapping (the ANSI parity contract)
    val e = intercept[Exception] {
      spark.sql(s"SELECT dot_l(array(${Long.MaxValue}L, ${Long.MaxValue}L), " +
        s"array(2L, 2L)) AS d").collect()
    }
    def msgs2(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs2(e).exists(_.toLowerCase.contains("overflow")),
      s"expected an overflow error, got: ${msgs2(e)}")
  }

  test("TopKAgg equals the window row_number spelling") {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.engine.Tables(spark, Sf, "embeddings")
      .select(col("label"), col("vec_id"),
        graft.ext.Similarity.normD(col("embedding")).as("score"))
    val viaWindow = emb
      .withColumn("rank", row_number().over(
        Window.partitionBy("label").orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select("label", "rank", "vec_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val viaAgg = graft.ext.Similarity.labelTopkNorm(spark, Sf)
      .select("label", "rank", "vec_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("HashedWindows agrees with the gram-string spelling: same positions, hash-equal iff gram-equal") {
    import spark.implicits._
    // repeats within and across docs, a short doc below L, mixed case/ws
    val docs = Seq(
      (1L, "A b c d e f G h i j"),
      (2L, "x  y c d e f g h q"),
      (3L, "a b c d e f g h i j"),
      (4L, "w1 w2 w3")).toDF("doc_id", "text")
    val L = 4
    val viaHash = graft.ext.SuffixDedup.gramHashesOf(docs, L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaStr = graft.ext.SuffixDedup.gramsOf(docs, L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(viaHash.keySet === viaStr.keySet, "same (doc_id, pos) coverage")
    assert(viaHash.nonEmpty)
    // hash equality must coincide with gram equality on every pair
    for (k1 <- viaHash.keys; k2 <- viaHash.keys)
      assert((viaHash(k1) == viaHash(k2)) === (viaStr(k1) == viaStr(k2)),
        s"$k1 vs $k2")
  }
  test("QualityCounts equals the regex spellings on real text and edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
    val docs = Seq(
      "the quick brown fox, JUMPED over 2 lazy dogs!!",
      "  leading and trailing   whitespace\tand tabs  ",
      "",
      "   ",
      "a",
      "punct-only: !!! ??? ;;; ...",
      "caf\u00e9 na\u00efve \u4f60\u597d mixed unicode",
      "the the the of of a",
      "single\nnewline\nand\rcarriage\freturns",
      // trim strips ONLY spaces: these begin/end with OTHER whitespace,
      // so split(limit -1) emits leading/trailing EMPTY tokens
      "\tleading tab",
      "trailing newline\n",
      "\n both ends \t",
      " \t ", // all-whitespace but not all-space: ["", ""] = 2 tokens
      "\r\n",
      "x" * 200)
      .toDF("text")
    val qc = ColumnBridge.column(graft.functions.QualityCounts(
      ColumnBridge.expression(col("text")), stops))
    val toks = split(trim(col("text")), "\\s+")
    val ref = docs.select(
      length(col("text")).cast("long").as("c"),
      size(toks).cast("long").as("t"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("p"),
      size(filter(toks, w => w.isInCollection(stops))).cast("long").as("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = docs.select(qc.as("q")).select(
      col("q.n_chars"), col("q.n_tokens"), col("q.n_punct"), col("q.n_stop"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === ref.toSeq)
  }

  test("QualityCounts codegen actually compiles (no interpreted fallback)") {
    // CODEGEN_ONLY turns Janino failures into hard errors instead of a
    // silent fallback — guards the addReferenceObj class-name spelling
    // ("java.lang.String[]", Java source syntax, not "[Ljava.lang.String;")
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val qc = ColumnBridge.column(graft.functions.QualityCounts(
        ColumnBridge.expression(col("text")), Seq("the", "a")))
      val row = Seq("the quick fox\n").toDF("text")
        .select(qc.as("q")).select(col("q.n_tokens"), col("q.n_stop"))
        .head()
      assert(row.getLong(0) === 4L) // ["the","quick","fox",""] under limit -1
      assert(row.getLong(1) === 1L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
