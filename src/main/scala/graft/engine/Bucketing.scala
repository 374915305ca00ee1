package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables — the co-located-join tool from SURVEY.md §7
  * ("partitioning & shuffle"): writing both fact tables bucketed (and
  * sorted) by their join key means every future join on that key reads
  * matching buckets directly — no Exchange on either side, at any scale.
  * That one-time write cost amortizes across every downstream join/agg
  * on the key, which is the difference between a nightly 100 TB join
  * that shuffles the warehouse and one that streams matching files.
  *
  * BucketingSpec asserts the physical plan property (no Exchange under
  * the join with broadcast disabled).
  */
object Bucketing {

  /** Stable 8-hex-digit md5 digest of a dataset path — the dataset
    * component of literal index-table names (every other parameter is
    * encoded as its literal value; the path alone is digested because
    * it may contain characters invalid in an identifier).
    */
  def pathDigest(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString

  /** Write `df` as a bucketed + sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
