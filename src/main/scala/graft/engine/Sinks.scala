package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The load layer (SURVEY.md §2.1 S6-S9): every way the reference writes
  * a table, re-expressed as parquet writes.
  *
  *   - S8 append — plain batch insert;
  *   - S7 truncate-load — full overwrite;
  *   - S6 idempotent windowed load — DYNAMIC partition overwrite on the
  *     day partition: exactly the reference's DELETE day-window +
  *     re-INSERT (`dags/flights_data_pipeline.py:168-177`) as one atomic
  *     operation, and the 100 TB shape (each daily increment rewrites
  *     only its own partitions; days are embarrassingly parallel);
  *   - S9 keyed upsert — MERGE without Delta: keep target rows whose key
  *     is absent from the source (left_anti), union the full source.
  *     Written via temp-dir swap because a parquet path cannot be
  *     overwritten while a plan still reads it lazily.
  */
object Sinks {

  /** S8: batch append insert. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** S7: full truncate-load. */
  def truncateLoad(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S6: idempotent day-window load. Adds a `p_date` partition column
    * derived from `tsCol`; dynamic overwrite replaces exactly the
    * partitions present in `df` and leaves every other day untouched —
    * re-running a day is a no-op-equivalent, late days never clobber
    * earlier ones.
    */
  def overwriteDayPartitions(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .partitionBy("p_date")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** S6 for one KNOWN day, written directly into that day's partition
    * directory (`path/p_date=<ds>/`) as a self-contained write job —
    * the same delete-window+insert contract as `overwriteDayPartitions`,
    * restricted to `ds`. The point is CONCURRENCY: a dynamic-overwrite
    * job stages under the table root's shared `_temporary`, so two
    * concurrent days on one table can clobber each other's in-flight
    * task output; here each (table, day) job's root IS the partition
    * directory, staging dirs are disjoint, and distinct days are safe
    * to write in parallel. Readers see the identical layout (partition
    * discovery infers `p_date` from the directory name).
    */
  def overwriteSingleDayPartition(df: DataFrame, tsCol: String, ds: String,
      path: String): Unit =
    df.filter(to_date(col(tsCol)) === lit(ds).cast("date"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/p_date=$ds")

  /** S9: keyed upsert (the PK map the reference declares in
    * `start.sh:24-33`): source rows win on key collision, target rows
    * without a colliding key survive. Returns the merged row count.
    *
    * Swap order is crash-safe: the old target is renamed ASIDE (not
    * deleted) before the merged data renames into place, so a failure
    * between the two renames leaves the previous data recoverable at
    * `path__upsert_old`; every fs call's boolean result is checked.
    */
  def upsert(spark: SparkSession, src: DataFrame, path: String, keys: Seq[String]): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val merged =
      if (fs.exists(target)) {
        val current = spark.read.parquet(path)
        current.join(src.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(src)
      } else src
    swapWrite(spark, merged, path)
  }

  /** Crash-safe replace of `path` with `df` (which may READ from `path` —
    * a parquet path cannot be overwritten while a plan still scans it
    * lazily): write to a tmp dir, rename the old target ASIDE (not
    * deleted), rename tmp into place, then drop the aside copy. A
    * failure between the renames leaves the previous data recoverable at
    * `path__swap_old`; every fs call's boolean result is checked.
    * Returns the written row count.
    */
  def swapWrite(spark: SparkSession, df: DataFrame, path: String): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + "__swap_tmp")
    val aside = new Path(path + "__swap_old")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    if (fs.exists(aside) && !fs.delete(aside, true))
      throw new java.io.IOException(s"swapWrite: cannot clear stale $aside")
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, aside))
      throw new java.io.IOException(s"swapWrite: cannot move $target aside")
    if (!fs.rename(tmp, target)) {
      if (hadTarget) fs.rename(aside, target) // best-effort rollback
      throw new java.io.IOException(s"swapWrite: cannot move $tmp into place")
    }
    if (hadTarget && !fs.delete(aside, true))
      throw new java.io.IOException(s"swapWrite: swap succeeded but cannot delete $aside")
    n
  }

  /** SCD Type 2 merge — dimension history the reference's truncate-load
    * dims cannot keep: the target carries `valid_from`/`valid_to`/
    * `is_current` alongside the attributes; merging a snapshot dated
    * `effectiveTs`
    *
    *   - inserts unseen keys as new current versions;
    *   - closes the current version (valid_to = effectiveTs,
    *     is_current = false) and opens a new one when any compared
    *     attribute changed;
    *   - leaves unchanged keys and all closed history untouched.
    *
    * `updates` must be UNIQUE per key (one attribute row per entity in
    * the snapshot — the same contract a MERGE statement has); duplicate
    * keys would open two concurrent current versions.
    *
    * One key-partitioned join per merge; history rows never reshuffle.
    * Re-merging the same snapshot is a no-op (idempotent backfill).
    */
  def scd2Merge(spark: SparkSession, updates: DataFrame, path: String,
      keys: Seq[String], compareCols: Seq[String],
      effectiveTs: java.sql.Timestamp): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val attrs = updates.columns.toSeq
    val fresh = updates
      .withColumn("valid_from", lit(effectiveTs))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val merged =
      if (!fs.exists(new Path(path))) fresh
      else {
        val target = spark.read.parquet(path)
        val history = target.filter(!col("is_current"))
        val current = target.filter(col("is_current"))
        val changeKeys = current.alias("c")
          .join(updates.alias("u"), keys)
          .filter(compareCols.map(a => !(col(s"c.$a") <=> col(s"u.$a")))
            .reduce(_ || _))
          .select(keys.map(col): _*) // USING join: key columns are unqualified
        val closed = current.join(changeKeys, keys, "left_semi")
          .withColumn("valid_to", lit(effectiveTs))
          .withColumn("is_current", lit(false))
        val stillCurrent = current.join(changeKeys, keys, "left_anti")
        val opened = fresh.join(
          // new key, or key whose attributes changed
          current.select(keys.map(col): _*).exceptAll(changeKeys), keys, "left_anti")
        history.unionByName(closed).unionByName(stillCurrent).unionByName(opened)
      }
    swapWrite(spark, merged, path)
  }
}
