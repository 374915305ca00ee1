package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table registry: name -> parquet path under a scale-factor directory.
  *
  * The reference keeps its catalog implicit in Airflow Variables
  * (`tables_to_extract`, reference `start.sh:20-23`) and Postgres schemas;
  * here the catalog is an explicit registry so sources stay declarative and
  * Catalyst sees a plain parquet relation (filter/column pushdown for free).
  */
object Tables {
  /** Driver-generated tables (see /root/repo/TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Scan a registered table. Schema comes from the parquet footer —
    * deterministic (driver-written), so no inference ambiguity to pin.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects (`PARQUET_TYPE_ILLEGAL`). We read it as a
    * raw long (`nanosAsLong`) and convert to micro-precision
    * TimestampType with integer `DIV` (a double division would lose
    * precision: epoch-nanos ~1.7e18 exceeds 2^53). DuckDB applies the
    * same nanos->micros truncation when it reads the file, so oracle
    * comparisons stay exact.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Sessions should set this at construction (Verify/Bench/SparkSpec
      // builders do); this is a fallback for ad-hoc sessions. It is
      // checked first so an already-configured session is never mutated
      // mid-flight (the set is visible session-wide, not per-read).
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      // TIMESTAMP(NANOS) arrives as a long under nanosAsLong and needs
      // the DIV-1000 truncation; a rewritten corpus (e.g. the 10x
      // scaling clone, written by DuckDB as micros) arrives as a native
      // timestamp already at oracle precision — accept both spellings
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case _ => raw
      }
    } else spark.read.parquet(path(dir, name))
}
