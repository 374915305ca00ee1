package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Sink-layer semantics: keyed upsert (S9) and the CSV edge NA rules
  * (S3/S5).
  */
class SinksSpec extends SparkSpec {

  private def tmpDir(): String = Files.createTempDirectory("graft_sinks").toString

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  private def df(rows: (Int, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)

  test("upsert inserts new keys and overwrites colliding ones") {
    val path = tmpDir() + "/t"
    Sinks.upsert(spark, df(1 -> "a", 2 -> "b"), path, Seq("k"))
    Sinks.upsert(spark, df(2 -> "B", 3 -> "c"), path, Seq("k"))
    val got = spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("upsert is idempotent") {
    val path = tmpDir() + "/t"
    Sinks.upsert(spark, df(1 -> "a", 2 -> "b"), path, Seq("k"))
    val n1 = Sinks.upsert(spark, df(2 -> "B"), path, Seq("k"))
    val n2 = Sinks.upsert(spark, df(2 -> "B"), path, Seq("k"))
    assert(n1 == 2 && n2 == 2)
    val got = spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "B"))
  }

  test("CSV round-trip preserves values, NULLs and numeric-looking strings") {
    val s = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("amount", DecimalType(10, 2)),
      StructField("ts", TimestampType),
      StructField("note", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1, "alice", new java.math.BigDecimal("120000.00"),
        java.sql.Timestamp.valueOf("2024-06-01 08:00:00"), "00123"),
      Row(2, null, new java.math.BigDecimal("9900.25"), null, "NaN-like"),
      Row(3, "NaN", null, java.sql.Timestamp.valueOf("2024-06-03 23:59:59"), null))
    val in = spark.createDataFrame(rows, s)
    val path = tmpDir() + "/csv"
    Sources.writeCsv(in, path)
    val back = Sources.readCsv(spark, s, path)
    val c = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")).sorted.toSeq
    // the literal string "NaN" is indistinguishable from NULL on the CSV
    // edge by design (the reference's pandas NA rule does the same) —
    // row 3's name comes back NULL
    val expected = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "alice", new java.math.BigDecimal("120000.00"),
        java.sql.Timestamp.valueOf("2024-06-01 08:00:00"), "00123"),
      Row(2, null, new java.math.BigDecimal("9900.25"), null, "NaN-like"),
      Row(3, null, null, java.sql.Timestamp.valueOf("2024-06-03 23:59:59"), null)), s)
    assert(c(back) == c(expected))
  }

  test("scd2 merge tracks attribute history and is idempotent") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val path = tmpDir() + "/dim"
    // day 1: two fresh keys
    Sinks.scd2Merge(spark, df(1 -> "a", 2 -> "b"), path,
      Seq("k"), Seq("v"), ts("2024-01-01 00:00:00"))
    // day 2: key 2 changes, key 3 appears, key 1 unchanged
    Sinks.scd2Merge(spark, df(1 -> "a", 2 -> "B", 3 -> "c"), path,
      Seq("k"), Seq("v"), ts("2024-01-02 00:00:00"))
    // replay of day 2 must be a no-op
    val n = Sinks.scd2Merge(spark, df(1 -> "a", 2 -> "B", 3 -> "c"), path,
      Seq("k"), Seq("v"), ts("2024-01-02 00:00:00"))
    assert(n == 4, s"expected 4 rows after idempotent replay, got $n")
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[String]("v"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current"))).toSet
    assert(rows == Set(
      (1, "a", None, true),
      (2, "b", Some("2024-01-02 00:00:00.0"), false),
      (2, "B", None, true),
      (3, "c", None, true)))
    // the current view is one row per key with the latest attributes
    val current = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("is_current"))
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(current == Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("JSONL round-trip preserves documents and event timestamps exactly") {
    val dir = tmpDir()
    val docs = Tables(spark, Sf, "documents")
    Sources.writeJsonl(docs, s"$dir/docs")
    val docsBack = Sources.readJsonl(spark, docs.schema, s"$dir/docs")
    assert(docsBack.count() == docs.count())
    assert(docsBack.exceptAll(docs).isEmpty && docs.exceptAll(docsBack).isEmpty,
      "unicode text and metadata must survive the JSONL hop")
    val ev = Tables(spark, Sf, "events").limit(500)
    Sources.writeJsonl(ev, s"$dir/ev")
    val evBack = Sources.readJsonl(spark, ev.schema, s"$dir/ev")
    assert(evBack.exceptAll(ev).isEmpty && ev.exceptAll(evBack).isEmpty,
      "micro-precision timestamps must re-parse bit-identically")
  }

  test("salvage JSONL read quarantines malformed lines, parses the rest") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "mixed.jsonl"),
      java.util.Arrays.asList(
        """{"k": 1, "v": "good"}""",
        """{"k": 2, "v": "also good"}""",
        """{"k": 3, "v": "truncat""", // malformed: cut mid-string
        """not json at all"""))
    val got = Sources.readJsonlSalvage(spark, schema, s"$dir/mixed.jsonl")
    val clean = got.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(clean == Map(1 -> "good", 2 -> "also good"))
    val quarantined = got
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      .collect().map(_.getAs[String]("_corrupt_record"))
    assert(quarantined.length == 2, "both bad lines land in quarantine with raw text")
    assert(quarantined.exists(_.contains("not json at all")))
  }

  test("split salvage read supports corrupt-lane counts without caching") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "mixed.jsonl"),
      java.util.Arrays.asList(
        """{"k": 1, "v": "good"}""",
        "",
        """{"k": 2, "v": "also good"}""",
        """{"k": 3, "v": "truncat""",
        """not json at all"""))
    val (clean, quarantine) = Sources.readJsonlSplit(spark, schema, s"$dir/mixed.jsonl")
    // the exact query shape that raises AnalysisException on the file-source
    // corrupt column must work here, uncached
    assert(quarantine.count() == 2)
    assert(clean.collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
      == Map(1 -> "good", 2 -> "also good"))
    assert(quarantine.collect().map(_.getAs[String]("_corrupt_record"))
      .exists(_.contains("not json at all")))
  }

  test("ORC round-trip preserves timestamps, doubles and text exactly") {
    val dir = tmpDir()
    val ev = Tables(spark, Sf, "events").limit(500)
    Sources.writeOrc(ev, s"$dir/ev")
    val evBack = Sources.readOrc(spark, ev.schema, s"$dir/ev")
    assert(evBack.exceptAll(ev).isEmpty && ev.exceptAll(evBack).isEmpty,
      "ORC is a typed columnar format — the round-trip must be lossless")
    val docs = Tables(spark, Sf, "documents")
    Sources.writeOrc(docs, s"$dir/docs")
    val docsBack = Sources.readOrc(spark, docs.schema, s"$dir/docs")
    assert(docsBack.exceptAll(docs).isEmpty && docs.exceptAll(docsBack).isEmpty)
  }

  test("evolving parquet read aligns old eras to the target schema") {
    val path = tmpDir() + "/evolving"
    // era 1: two columns
    df(1 -> "a", 2 -> "b").write.parquet(path)
    // era 2: a third column exists now
    val v2 = StructType(schema.fields :+ StructField("extra", LongType))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(3, "c", 30L)), v2)
      .write.mode("append").parquet(path)
    val target = StructType(Seq(
      StructField("k", LongType),          // widened from int
      StructField("v", StringType),
      StructField("extra", LongType),      // absent in era 1
      StructField("brand_new", StringType) // absent everywhere
    ))
    val got = Sources.readParquetEvolving(spark, target, path)
    assert(got.schema == target)
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), Option(r.getString(3)))).toSet
    assert(rows == Set(
      (1L, "a", None, None), (2L, "b", None, None), (3L, "c", Some(30L), None)))
  }

  test("compaction rewrites many small files into few, data intact") {
    val path = tmpDir() + "/frag"
    // simulate a long incremental history: 20 tiny appends
    (1 to 20).foreach(i => df(i -> s"v$i").write.mode("append").parquet(path))
    val before = spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    val nAfter = Sources.compact(spark, path)
    assert(nAfter < 20, s"expected fewer files after compaction, got $nAfter")
    val after = spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    assert(after == before, "compaction must not change the data")
  }

  test("day-partitioned staging prunes partitions on read") {
    import org.apache.spark.sql.functions._
    val path = tmpDir() + "/staged"
    val ev = Tables(spark, Sf, "events")
      .filter(col("ts").between(
        lit("2024-01-03 00:00:00").cast("timestamp"),
        lit("2024-01-05 23:59:59").cast("timestamp")))
    Sinks.overwriteDayPartitions(ev, "ts", path)
    val oneDay = spark.read.parquet(path)
      .filter(col("p_date") === lit("2024-01-04").cast("date"))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("p_date"),
      s"day filter must prune at the partition level, not post-scan:\n$plan")
    val expected = ev.filter(to_date(col("ts")) === lit("2024-01-04").cast("date")).count()
    assert(oneDay.count() == expected && expected > 0)
  }

  test("day-partition overwrite replaces only its own day") {
    val s = StructType(Seq(
      StructField("id", IntegerType), StructField("updated_at", TimestampType)))
    def mk(rows: (Int, String)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        Row(r._1, java.sql.Timestamp.valueOf(r._2))): _*), s)
    val path = tmpDir() + "/t"
    Sinks.overwriteDayPartitions(mk(1 -> "2024-06-10 10:00:00", 2 -> "2024-06-11 10:00:00"),
      "updated_at", path)
    // rewrite day 11 with a different row; day 10 must survive
    Sinks.overwriteDayPartitions(mk(3 -> "2024-06-11 12:00:00"), "updated_at", path)
    val ids = spark.read.parquet(path).select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == Seq(1, 3))
  }
}
