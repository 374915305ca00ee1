package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned snapshot table with time travel — a minimal Delta-style
  * commit protocol over plain parquet, giving the warehouse zone what the
  * reference's truncate-load Postgres tables cannot: every load keeps the
  * previous snapshots readable, a reader can pin a version for a whole
  * job (snapshot isolation across re-loads), and a bad load is undone by
  * reading `asOf` the prior version instead of restoring a backup.
  *
  * Layout: `<root>/v=<N>/` one self-contained parquet dir per version.
  *
  * Commit protocol (crash-safe, single-writer-atomic):
  *   1. the snapshot writes to `<root>/.tmp-v<N>-<nonce>` — dot-prefixed,
  *      so no reader ever lists it;
  *   2. ONE atomic directory rename publishes it as `<root>/v=<N>`.
  *
  * A writer that dies before step 2 leaves only an invisible tmp dir
  * (cleaned opportunistically by later commits). Two racing writers can
  * both pick N; rename alone CANNOT arbitrate, because Hadoop
  * `FileSystem.rename(src, dst)` with an existing directory `dst` moves
  * src INTO dst and returns true (HDFS and RawLocalFileSystem alike) —
  * a loser that trusted the rename's boolean would bury its snapshot as
  * a hidden child of the winner's version and believe it won. So every
  * commit carries a `_nonce-<id>` marker file, and a rename only counts
  * as winning if the published dir contains THIS writer's marker; a
  * buried loser pulls its snapshot back out of the winner's dir (dot-
  * prefixed, so readers never saw it) and retries at N+1. Readers
  * resolve versions by LISTING committed `v=*` dirs only, so they never
  * observe a partial write. This is the same publish-by-rename
  * discipline as [[Sinks.swapWrite]], with nonce-verified arbitration
  * and history retained instead of swapped.
  *
  * At scale the listing is one directory's metadata (versions, not
  * files); snapshots are immutable so caches/bucketing survive; `vacuum`
  * bounds storage by dropping all but the last `keepLast` versions.
  */
object VersionedTable {

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VDir = "^v=(\\d+)$".r

  /** Committed versions at `root`, ascending. Empty if the table does not
    * exist yet.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VDir(n) => Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Publish `df` as the next version; returns the committed version
    * number. Optimistic under writer races: loses a rename, retries at
    * the next number.
    */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(root))
    // opportunistic cleanup of tmp dirs older than 1h (a crashed writer's
    // leftovers) — never a committed version, so always safe
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.getPath.getName.startsWith(".tmp-") &&
        st.getModificationTime < System.currentTimeMillis() - 3600L * 1000L)
      .foreach(st => fs.delete(st.getPath, true))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmpName = s".tmp-$nonce"
    val tmp = new Path(s"$root/$tmpName")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val marker = s"_nonce-$nonce"
    fs.create(new Path(tmp, marker), true).close()
    var attempt = latestVersion(spark, root).map(_ + 1L).getOrElse(0L)
    val lastAttempt = attempt + 10000L // liveness guard: a broken FS
    // (rename false with no dest) must surface as an error, not a spin
    var published = false
    while (!published) {
      if (attempt > lastAttempt) throw new java.io.IOException(
        s"VersionedTable: gave up publishing $tmp after 10000 contested versions")
      val dest = new Path(s"$root/v=$attempt")
      if (!fs.exists(dest) && fs.rename(tmp, dest) &&
          fs.exists(new Path(dest, marker))) {
        published = true
      } else {
        // Lost the race. If the rename "succeeded" into the winner's
        // dir, our whole snapshot now sits at dest/<tmpName> — pull it
        // back out (a metadata move, no data rewrite) and retry at the
        // next number.
        val buried = new Path(dest, tmpName)
        if (fs.exists(buried) && !fs.rename(buried, tmp))
          throw new java.io.IOException(
            s"VersionedTable: cannot recover buried snapshot $buried")
        if (!fs.exists(tmp)) throw new java.io.IOException(
          s"VersionedTable: snapshot $tmp lost publishing as $dest")
        attempt += 1L
      }
    }
    attempt
  }

  /** Read a snapshot: the latest version, or exactly `asOf` (which must
    * be committed — reading an uncommitted/vacuumed version is an error,
    * not silent fallback).
    */
  def read(spark: SparkSession, root: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"VersionedTable: no committed versions at $root")
    val v = asOf match {
      case Some(n) =>
        require(vs.contains(n),
          s"VersionedTable: version $n not committed at $root (have ${vs.mkString(",")})")
        n
      case None => vs.last
    }
    spark.read.parquet(s"$root/v=$v")
  }

  /** Publish `df` at EXACTLY `version` if that version does not already
    * exist; returns true if this call published it. The rename-if-absent
    * arbitration makes a retried publish of the same version a no-op —
    * the exactly-once hook a streaming `foreachBatch` needs: keying the
    * version by batchId turns an at-least-once replay into a skipped
    * commit (the replayed batch finds its version already on disk).
    */
  def commitIfAbsent(df: DataFrame, root: String, version: Long): Boolean = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    val dest = new Path(s"$root/v=$version")
    if (fs.exists(dest)) return false
    fs.mkdirs(new Path(root))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmpName = s".tmp-$nonce"
    val tmp = new Path(s"$root/$tmpName")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val marker = s"_nonce-$nonce"
    fs.create(new Path(tmp, marker), true).close()
    if (!fs.exists(dest) && fs.rename(tmp, dest) &&
        fs.exists(new Path(dest, marker))) true
    else {
      // Lost to a racing replay — its commit stands. The rename may
      // have buried our snapshot INSIDE the winner's dir (Hadoop
      // rename-into-existing-dir returns true); delete whichever copy
      // of ours survives, never the winner's data.
      val buried = new Path(dest, tmpName)
      if (fs.exists(buried)) fs.delete(buried, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // "Lost the race" is only true if SOMEONE published the version.
      // A rename that failed with dest still absent (transient/broken
      // FS) must surface as an error — returning false here would tell
      // the caller the version exists when nothing was ever committed.
      if (!fs.exists(dest)) throw new java.io.IOException(
        s"VersionedTable: rename to $dest failed but no version was published")
      false
    }
  }

  /** Targeted delete (the GDPR forget-me workflow) over immutable
    * snapshots: publishes a NEW version equal to the latest minus rows
    * matching `pred` — readers pinned to old versions are undisturbed,
    * and the physical forget completes when `vacuum` retires the
    * pre-delete snapshots. Returns the new version number. At scale this
    * is one filtered rewrite of the latest snapshot — the anti-join/
    * rewrite every snapshot store pays for row-level deletes without
    * tombstone support.
    */
  def deleteWhere(spark: SparkSession, root: String,
      pred: org.apache.spark.sql.Column): Long = {
    // `pred <=> true` so rows where pred is NULL are RETAINED: plain
    // filter(!pred) drops them under three-valued logic (NULL is not
    // true), turning e.g. col("email")===x into "also forget everyone
    // with no email".
    import org.apache.spark.sql.functions.lit
    commit(read(spark, root).filter(!(pred <=> lit(true))), root)
  }

  /** Change-data-capture diff between two committed snapshots: one row
    * per key that was INSERTED, DELETED, or UPDATED going from `vOld`
    * to `vNew` (unchanged keys are absent — a CDC feed carries changes,
    * not the table). Change detection hashes ALL non-key columns
    * (xxhash64), so any attribute edit surfaces as an update without
    * naming columns. A full-outer join of two snapshots keyed on the
    * primary key — at scale, two snapshot scans and one key shuffle,
    * which is what turns the snapshot store into an incremental-export
    * source.
    */
  def diff(spark: SparkSession, root: String, vOld: Long, vNew: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def sided(v: Long, tag: String) = {
      val df = read(spark, root, Some(v))
      val valueCols = df.columns.filterNot(keys.contains).toSeq
      df.select(keys.map(col) :+
        xxhash64((keys ++ valueCols).map(col): _*).as(s"_h_$tag"): _*)
    }
    sided(vOld, "old").join(sided(vNew, "new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_h_old").isNull, "insert")
          .when(col("_h_new").isNull, "delete")
          .when(col("_h_old") =!= col("_h_new"), "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
      .orderBy(keys.map(col): _*)
  }

  /** Small-file compaction: publish a NEW version equal to the latest,
    * rewritten into ~`targetBytes`-sized files (the bin-packing rewrite
    * every snapshot store needs once streaming ingest has committed
    * thousands of per-batch snapshots whose union is million-file
    * metadata). Data is untouched — same rows, fewer files; readers
    * pinned to old versions are undisturbed and `vacuum` retires the
    * fragmented history. Returns (new version, files before, files
    * after). File count = ceil(current bytes / targetBytes), computed
    * from the snapshot's own listing — no data pass before the rewrite.
    */
  def compactFiles(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): (Long, Int, Int) = {
    val fs = fsOf(spark, root)
    val v = latestVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"VersionedTable: nothing to compact at $root"))
    val dir = new Path(s"$root/v=$v")
    val parts = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val newV = commit(read(spark, root).coalesce(nOut), root)
    val after = fs.listStatus(new Path(s"$root/v=$newV")).toSeq
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (newV, parts.size, after)
  }

  /** Drop all but the newest `keepLast` versions; returns the versions
    * removed. The latest version is never removed.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the latest version")
    val fs = fsOf(spark, root)
    val doomed = versions(spark, root).dropRight(keepLast)
    doomed.foreach { v =>
      if (!fs.delete(new Path(s"$root/v=$v"), true))
        throw new java.io.IOException(s"VersionedTable: cannot vacuum v=$v at $root")
    }
    doomed
  }
}
