package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** The CSV edge (SURVEY.md §2.1 S3/S5): the reference hops every table
  * through CSV between extract and load (`dags/flights_data_pipeline
  * .py:126-127,160`). We keep parquet internally and reproduce the CSV
  * edge semantics at the API boundary:
  *
  *   - write: header on, all fields quoted (the stable superset of
  *     pandas' QUOTE_NONNUMERIC — numerics re-parse identically either
  *     way, and `quoteAll` round-trips strings that LOOK numeric);
  *   - read: a DECLARED schema, never inference (kills the reference's
  *     schema-on-read hole), with the reference's NA rule — only the
  *     literal `NaN` and the empty field are NULL.
  */
object Sources {

  /** S3: CSV sink. One directory of part files; timestamps in the
    * session timezone with explicit format so the read side re-parses
    * bit-identically.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("quoteAll", "true")
      .option("nullValue", "NaN")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .mode(SaveMode.Overwrite)
      .csv(path)

  /** S5: CSV source with a declared schema and the pandas
    * `keep_default_na=False, na_values=['NaN','']` rule.
    */
  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "NaN")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schema)
      .csv(path)

  /** ORC sink/source — the second columnar format Spark ships natively;
    * full type fidelity (timestamps, decimals, nested types), so unlike
    * the text formats the round-trip needs no re-parse options. Kept
    * behind the same declared-schema discipline as every other source.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JSON-lines sink — the interchange format LLM training corpora ship
    * in. One JSON object per line, partition-parallel like any text
    * sink; timestamps pinned to a zone-less micros format so the read
    * side re-parses bit-identically in a UTC session.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("ignoreNullFields", "false")
      .mode(SaveMode.Overwrite)
      .json(path)

  /** JSON-lines source under a DECLARED schema (inference over a corpus
    * is a full extra pass AND nondeterministic under partial reads —
    * never at 100 TB).
    */
  def readJsonl(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .schema(schema)
      .json(path)

  /** Salvage-mode JSONL read: real corpus drops are never 100% clean, and
    * a single truncated line must not kill a 100 TB ingest (FAILFAST)
    * or silently vanish (DROPMALFORMED). PERMISSIVE mode parses what it
    * can and lands each malformed line's raw text in `_corrupt_record`.
    *
    * CAVEAT (Spark ≥ 2.3): a query over this frame whose referenced
    * columns are ONLY the internal corrupt-record column (e.g.
    * `df.filter($"_corrupt_record".isNotNull).count()`) raises
    * AnalysisException unless the frame is cached first — the JSON scan
    * won't re-parse a file just to report what it could not parse.
    * Callers wanting the quarantine-rate workflow should use
    * `readJsonlSplit`, which never hits the restriction.
    */
  def readJsonlSalvage(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .json(path)

  /** Salvage-mode JSONL read, pre-split into (clean, quarantine) lanes so
    * callers never issue a corrupt-column-only query (the
    * `readJsonlSalvage` caveat). The file is scanned as TEXT and parsed
    * with `from_json` — a per-line expression, exempt from the file
    * source's corrupt-record restriction — so `quarantine.count()` /
    * rate alerts work directly, with no cache and no second parse pass.
    * Blank lines are dropped (the text source sees them; the JSON file
    * source would skip them). Clean lane carries exactly `schema`;
    * quarantine carries the raw line as `_corrupt_record`.
    */
  def readJsonlSplit(spark: SparkSession, schema: StructType,
      path: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json, length, trim}
    val opts = Map(
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt_record")
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), withCorrupt, opts).as("r"))
    val clean = parsed.filter(col("r._corrupt_record").isNull)
      .select(schema.fieldNames.toSeq.map(n => col(s"r.`$n`").as(n)): _*)
    val quarantine = parsed.filter(col("r._corrupt_record").isNotNull)
      .select(col("value").as("_corrupt_record"))
    (clean, quarantine)
  }

  /** Schema-aligned read over evolving parquet: every incremental append
    * era wrote whatever columns existed then; the read presents ONE
    * target schema — missing columns become typed NULLs, present ones
    * cast to the target type. `mergeSchema` unions the file footers (a
    * footer pass, not a data pass), then the projection aligns. The
    * columns a file lacks are filled at scan time from the footer diff,
    * so old eras never need rewriting — the 100 TB answer to "we added a
    * column last year". Caveat: eras must agree on the PHYSICAL type of
    * shared columns (parquet footer merging cannot reconcile e.g. an
    * int32 era with an int64 era of the same column — that change still
    * requires a rewrite); widening happens in the aligning projection,
    * from the merged type to the target type.
    */
  def readParquetEvolving(spark: SparkSession, schema: StructType, path: String): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    val present = merged.columns.toSet
    merged.select(schema.fields.toSeq.map { f =>
      if (present.contains(f.name))
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)
      else
        org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Small-file compaction: rewrite `path` into ~`targetFileBytes` files
    * (long incremental histories accumulate thousands of tiny part
    * files; at scale the scan's task-scheduling overhead and NameNode/
    * listing pressure dominate — compaction restores healthy file
    * sizes). Uses the crash-safe swap so readers never see a partial
    * rewrite. Returns the new file count.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path).repartition(nFiles)
    Sinks.swapWrite(spark, df, path)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
