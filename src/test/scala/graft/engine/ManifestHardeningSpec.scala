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
    val beforeGrace = VersionedTable.tornManifestGraceMillis
    val beforeSingle = VersionedTable.assumeSingleWriterManifests
    try super.withFixture(test)
    finally {
      VersionedTable.defaultMode = before
      VersionedTable.putIfAbsentOverride = None
      VersionedTable.tornManifestGraceMillis = beforeGrace
      VersionedTable.assumeSingleWriterManifests = beforeSingle
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

  test("the next commit reclaims a STALE torn manifest instead of skipping past it") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    VersionedTable.tornManifestGraceMillis = 0L // every torn file is stale
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

  test("a YOUNG torn manifest is not raced by optimistic commits (live-writer grace)") {
    // the ADVICE hazard: a slow-but-alive writer between create() and
    // close() must never have its manifest deleted from under it by an
    // optimistic commit — that writer's close() could still succeed and
    // both commits would report the same version
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = tmpRoot("graft_young")
    VersionedTable.commit(df(10), root) // v0
    // the live writer: create() happened seconds ago, close() pending
    fs(root).create(new Path(s"$root/_manifests/v=1.json"), false).close()
    // optimistic commit must SKIP the young torn name, not reclaim it
    assert(VersionedTable.commit(df(20), root) === 2L,
      "an optimistic commit must wait out the torn-manifest grace window")
    assert(fs(root).exists(new Path(s"$root/_manifests/v=1.json")),
      "the young torn manifest must be left for its (possibly live) writer")
    // the REPLAY path still reclaims at once — v=1's only legitimate
    // writer is the replaying caller itself
    assert(VersionedTable.commitIfAbsent(df(30), root, 1L))
    assert(VersionedTable.read(spark, root, Some(1L)).count() === 30L)
  }

  test("a PARTIAL non-empty manifest is uncommitted: unlisted, unbricked, reclaimed") {
    // crash mid-write on a store without atomic whole-payload visibility:
    // the manifest has bytes but no parseable dir field
    VersionedTable.defaultMode = CommitMode.ManifestLog
    VersionedTable.tornManifestGraceMillis = 0L
    val root = tmpRoot("graft_partial")
    VersionedTable.commit(df(10), root) // v0
    val torn = new Path(s"$root/_manifests/v=1.json")
    val out = fs(root).create(torn, false)
    out.write("""{"version":1,"di""".getBytes("UTF-8")) // truncated body
    out.close()
    assert(VersionedTable.versions(spark, root) === Seq(0L),
      "a partially-written manifest must not list as committed")
    assert(VersionedTable.read(spark, root).count() === 10L,
      "latest-read must keep serving the last whole version")
    // replay at the torn version must COMMIT (skipping would drop data)
    assert(VersionedTable.commitIfAbsent(df(25), root, 1L),
      "a partial manifest is not a committed version")
    assert(VersionedTable.read(spark, root, Some(1L)).count() === 25L)
    assert(VersionedTable.versions(spark, root) === Seq(0L, 1L))
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

  private def htpRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.htp.impl", classOf[HeadThenPutFileSystem].getName)
    "htp://" + java.nio.file.Files.createTempDirectory("htp").toString + "/t"
  }

  test("manifest commits FAIL FAST on a HEAD-then-PUT store without the LogStore seam") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    VersionedTable.resetProbeCache()
    val root = htpRoot()
    val boom = intercept[java.io.IOException] {
      VersionedTable.commit(df(5), root)
    }
    assert(boom.getMessage.contains("HEAD-then-PUT"),
      s"the probe must name the hazard, got: ${boom.getMessage}")
    assert(boom.getMessage.contains("putIfAbsentOverride"),
      "the failure must carry the documented remedy")
    assert(VersionedTable.versions(spark, root).isEmpty,
      "nothing may list as committed after the fail-fast")
  }

  test("the probed store commits fine once the seam or single-writer pledge is given") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    VersionedTable.resetProbeCache()
    val root = htpRoot()
    // remedy 1: the deployment declares single-writer use
    VersionedTable.assumeSingleWriterManifests = true
    assert(VersionedTable.commit(df(5), root) === 0L)
    assert(VersionedTable.read(spark, root).count() === 5L)
    // remedy 2: the store's real conditional PUT installed as the seam
    VersionedTable.assumeSingleWriterManifests = false
    VersionedTable.putIfAbsentOverride = Some { (f, p, body) =>
      if (f.exists(p)) false
      else { val o = f.create(p, true); o.write(body.getBytes("UTF-8")); o.close(); true }
    }
    assert(VersionedTable.commit(df(7), root) === 1L)
    assert(VersionedTable.read(spark, root, Some(1L)).count() === 7L)
  }

  test("the probe passes stores whose create() arbitrates server-side") {
    // a non-local wrapper whose create is EAGER (the file exists, and
    // blocks a second create, from create() on — HDFS-under-a-lease
    // semantics) must pass: fail-fast is for HEAD-then-PUT only
    VersionedTable.defaultMode = CommitMode.ManifestLog
    VersionedTable.resetProbeCache()
    spark.sparkContext.hadoopConfiguration
      .set("fs.ecr.impl", classOf[EagerCreateFileSystem].getName)
    val root = "ecr://" +
      java.nio.file.Files.createTempDirectory("ecr_probe").toString + "/t"
    assert(VersionedTable.commit(df(5), root) === 0L)
    assert(VersionedTable.read(spark, root).count() === 5L)
    assert(VersionedTable.commit(df(6), root) === 1L,
      "the probe verdict is cached — later commits must not re-probe or fail")
  }

  test("a transient probe failure RETHROWS — never cached as a safe verdict") {
    VersionedTable.resetProbeCache()
    spark.sparkContext.hadoopConfiguration
      .set("fs.fhp.impl", classOf[FlakyHeadThenPutFileSystem].getName)
    val dir = "fhp://" +
      java.nio.file.Files.createTempDirectory("fhp_probe").toString
    val near = new Path(s"$dir/_manifests/v=0.json")
    val pfs = near.getFileSystem(spark.sparkContext.hadoopConfiguration)
    pfs.mkdirs(near.getParent)
    // arm: the probe's SECOND create (its first is the probe file
    // itself) hits a simulated throttle — on this genuinely
    // HEAD-then-PUT store, the r16 behavior took any IOException as
    // proof of arbitration and cached "safe" per-process
    FlakyHeadThenPutFileSystem.createCountdown.set(2)
    val boom = intercept[java.io.IOException] {
      VersionedTable.createArbitratesAtCreate(pfs, near)
    }
    assert(boom.getMessage.contains("transient throttle"),
      s"the transient failure must surface, got: ${boom.getMessage}")
    // the throttle cleared: the RE-probe (nothing was cached) now sees
    // the store's true HEAD-then-PUT semantics — not a stale "safe"
    assert(!VersionedTable.createArbitratesAtCreate(pfs, near),
      "after a transient failure the next probe must run and detect HEAD-then-PUT")
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
