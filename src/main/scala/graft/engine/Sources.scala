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
}
