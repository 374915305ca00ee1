package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec

/** Manifest-mode failure hardening (this round's advisory closures):
  *
  *   - a ZERO-LENGTH manifest (a writer dying between create() and
  *     close() on a store without the hard-link commit point) reads as
  *     UNCOMMITTED — skipped by listings, never bricking read()/latest,
  *     and RECLAIMED by the next commit at that version;
  *   - the commit point is pluggable LogStore-style, because stock
  *     S3A's create(overwrite=false) is HEAD-then-PUT, not a
  *     conditional PUT — deployments install the store's real
  *     primitive via [[VersionedTable.putIfAbsentOverride]];
  *   - versionModTime is total and dropVersion tolerates
  *     already-removed versions, so concurrent vacuums race to a
  *     no-op instead of an aborted sweep;
  *   - a SnapshotSet's child roots inherit the SET's commit mode even
  *     when the process default has since drifted.
  */
class ManifestHardeningSpec extends SparkSpec {

  import spark.implicits._

  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val before = VersionedTable.defaultMode
    try super.withFixture(test)
    finally {
      VersionedTable.defaultMode = before
      VersionedTable.putIfAbsentOverride = None
    }
  }

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def df(n: Int) = (1 to n).map(_.toLong).toDF("id")

  private def fs(root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a zero-length manifest is uncommitted: invisible to listings and reads") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = tmpRoot("graft_torn")
    VersionedTable.commit(df(10), root) // v0
    // the crash leftover: create() happened, close() never wrote a byte
    fs(root).create(new Path(s"$root/_manifests/v=1.json"), false).close()
    assert(VersionedTable.versions(spark, root) === Seq(0L),
      "a torn manifest must not list as committed")
    assert(VersionedTable.latestVersion(spark, root) === Some(0L))
    assert(VersionedTable.read(spark, root).count() === 10L,
      "latest-read must keep serving the last whole version")
  }

  test("the next commit reclaims a torn manifest instead of skipping past it") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = tmpRoot("graft_torn2")
    VersionedTable.commit(df(10), root) // v0
    fs(root).create(new Path(s"$root/_manifests/v=1.json"), false).close()
    // commit() resumes at latest+1 = 1: the torn name must be reclaimed
    assert(VersionedTable.commit(df(20), root) === 1L)
    assert(VersionedTable.read(spark, root, Some(1L)).count() === 20L)
    // and a replayed exactly-once commit at a torn version must COMMIT,
    // not report "already there" (that would drop the replay's data)
    fs(root).create(new Path(s"$root/_manifests/v=2.json"), false).close()
    assert(VersionedTable.commitIfAbsent(df(30), root, 2L),
      "a torn manifest is not a committed version")
    assert(VersionedTable.read(spark, root, Some(2L)).count() === 30L)
  }

  test("putIfAbsentOverride is the commit point when installed (LogStore seam)") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = tmpRoot("graft_seam")
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    VersionedTable.putIfAbsentOverride = Some { (f, p, body) =>
      puts.incrementAndGet()
      // a faithful conditional PUT: whole-body, create-if-absent
      if (f.exists(p)) false
      else { val o = f.create(p, false); o.write(body.getBytes("UTF-8")); o.close(); true }
    }
    assert(VersionedTable.commit(df(5), root) === 0L)
    assert(puts.get() >= 1, "the installed commit point must be invoked")
    // a losing conditional put surfaces as the normal race path
    assert(!VersionedTable.commitIfAbsent(df(5), root, 0L))
    assert(VersionedTable.read(spark, root, Some(0L)).count() === 5L)
  }

  test("versionModTime is total and dropVersion tolerates a lost race") {
    val root = tmpRoot("graft_race")
    VersionedTable.commit(df(5), root) // v0, rename mode
    assert(VersionedTable.versionModTime(spark, root, 99L) === Long.MaxValue,
      "a concurrently-swept version must read as too-new, not throw")
    VersionedTable.dropVersion(spark, root, 99L) // no-op, not an error
    VersionedTable.dropVersion(spark, root, 0L)
    VersionedTable.dropVersion(spark, root, 0L) // second drop: no-op
    assert(VersionedTable.versions(spark, root).isEmpty)
  }

  test("SnapshotSet child roots inherit the set's mode across default drift") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = tmpRoot("graft_setmode")
    SnapshotSet.publish(spark, root, Map("a" -> df(3)))
    // the drift: a table is ADDED to the set after the default flipped
    VersionedTable.defaultMode = CommitMode.Rename
    SnapshotSet.publish(spark, root, Map("a" -> df(4), "b" -> df(5)))
    assert(VersionedTable.modeOf(spark, s"$root/tables/b") === CommitMode.ManifestLog,
      "a table root created later must take the set's protocol, not the default")
    assert(SnapshotSet.readTable(spark, root, "b").count() === 5L)
  }
}
