package graft.engine

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The object-store commit question, answered both ways under a
  * FileSystem whose rename is copy-then-delete with an injected crash
  * (what S3/GCS actually give you):
  *
  *   - RENAME mode's hazard is real: a crash mid-"rename" leaves a
  *     PARTIAL version listed as committed, and readers silently get
  *     half the rows — wrong results, not an error.
  *   - MANIFEST-LOG mode is immune: no rename exists on its publish
  *     path, a writer crashing between the data write and the manifest
  *     put leaves readers on the previous version, and the conditional
  *     put arbitrates races without the bury-and-recover dance.
  */
class ObjectStoreCommitSpec extends SparkSpec {

  private def crashyRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.crashy.impl", classOf[CrashyFileSystem].getName)
    "crashy://" + java.nio.file.Files.createTempDirectory("crashy").toString + "/t"
  }

  private def twoPartDf = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "v").repartition(2)
  }

  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    try super.withFixture(test)
    finally {
      CrashyFileSystem.disarm()
      VersionedTable.beforeManifestPut = () => ()
      VersionedTable.defaultMode = CommitMode.Rename
    }
  }

  test("HAZARD: rename mode on a non-atomic-rename store publishes a torn version") {
    val root = crashyRoot()
    VersionedTable.commit(twoPartDf, root) // v0, unarmed
    assert(VersionedTable.read(spark, root).count() === 100L)
    // arm: the v=1 publish rename crashes after 3 of 4 files (_SUCCESS,
    // the nonce marker, part-00000 — part-00001 never arrives)
    CrashyFileSystem.crashDstRegex = Some("^v=1$".r)
    CrashyFileSystem.crashAfterFiles = 3
    val boom = intercept[java.io.IOException] {
      VersionedTable.commit(twoPartDf, root)
    }
    assert(boom.getMessage.contains("injected crash"))
    CrashyFileSystem.disarm()
    // the torn version is LISTED as committed…
    assert(VersionedTable.versions(spark, root).contains(1L),
      "the partial rename left v=1 visible — that IS the hazard")
    // …and reads return PARTIAL data with no error: silent wrong results
    val seen = VersionedTable.read(spark, root, Some(1L)).count()
    assert(seen > 0L && seen < 100L,
      s"expected a torn half-snapshot, got $seen of 100 rows")
  }

  test("manifest mode commits atomically on the same non-atomic-rename store") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = crashyRoot()
    // the same armed trap: if ANY rename to v=1 happened it would crash
    CrashyFileSystem.crashDstRegex = Some("^v=1$".r)
    val v0 = VersionedTable.commit(twoPartDf, root)
    val v1 = VersionedTable.commit(twoPartDf, root)
    assert((v0, v1) === ((0L, 1L)))
    assert(VersionedTable.read(spark, root, Some(1L)).count() === 100L,
      "manifest publish must never pass through a rename")
    assert(VersionedTable.read(spark, root, Some(0L)).count() === 100L)
  }

  test("manifest mode: a writer crashing before the put leaves readers on the old version") {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = crashyRoot()
    VersionedTable.commit(twoPartDf, root) // v0
    VersionedTable.beforeManifestPut =
      () => throw new java.io.IOException("injected crash before manifest put")
    intercept[java.io.IOException] { VersionedTable.commit(twoPartDf, root) }
    VersionedTable.beforeManifestPut = () => ()
    // no torn version: the set of committed versions is unchanged and
    // the orphan payload dir is unreachable garbage
    assert(VersionedTable.versions(spark, root) === Seq(0L))
    assert(VersionedTable.read(spark, root).count() === 100L)
    // recovery needs nothing: the next commit publishes v1 normally
    assert(VersionedTable.commit(twoPartDf, root) === 1L)
    assert(VersionedTable.read(spark, root).count() === 100L)
  }

  test("manifest mode: concurrent commits arbitrate on the conditional put") {
    import spark.implicits._
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = java.nio.file.Files.createTempDirectory("mlog").toString + "/t"
    val n = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            VersionedTable.commit(Seq((i.toLong, s"w$i")).toDF("id", "w"), root)
        })
      }
      val won = futures.map(_.get())
      assert(won.toSet === (0L until n.toLong).toSet,
        s"each writer must win a distinct consecutive version, got $won")
      (0 until n).foreach { i =>
        val rows = VersionedTable.read(spark, root, Some(won(i))).collect()
        assert(rows.length === 1 && rows(0).getString(1) === s"w$i",
          s"version ${won(i)} must hold writer $i's snapshot only")
      }
    } finally pool.shutdown()
  }

  test("manifest mode: racing commitIfAbsent replays — one wins, losers leave no payload") {
    import spark.implicits._
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = java.nio.file.Files.createTempDirectory("mlog_replay").toString + "/t"
    val n = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = VersionedTable.commitIfAbsent(
            Seq((i.toLong, s"r$i")).toDF("id", "w"), root, 7L)
        })
      }
      val wins = futures.map(_.get())
      assert(wins.count(identity) === 1,
        s"exactly one replay must publish version 7, got $wins")
      assert(VersionedTable.read(spark, root, Some(7L)).count() === 1L)
      // losers deleted their payload dirs — exactly one data-* remains
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dataDirs = fs.listStatus(new Path(root))
        .map(_.getPath.getName).count(_.startsWith("data-"))
      assert(dataDirs === 1, s"losing replays must retire their payloads, found $dataDirs")
    } finally pool.shutdown()
  }

  test("manifest mode: vacuum drops manifests first, payloads with them; time travel holds") {
    import spark.implicits._
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = java.nio.file.Files.createTempDirectory("mlog_vac").toString + "/t"
    (0 until 4).foreach(i =>
      VersionedTable.commit(Seq((i.toLong, s"v$i")).toDF("id", "v"), root))
    assert(VersionedTable.read(spark, root, Some(1L)).collect()
      .map(_.getString(1)).toSeq === Seq("v1"))
    val removed = VersionedTable.vacuum(spark, root, keepLast = 2)
    assert(removed === Seq(0L, 1L))
    assert(VersionedTable.versions(spark, root) === Seq(2L, 3L))
    intercept[IllegalArgumentException] { VersionedTable.read(spark, root, Some(0L)) }
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(new Path(root))
      .map(_.getPath.getName).count(_.startsWith("data-"))
    assert(dataDirs === 2, "vacuumed versions' payload dirs must be deleted")
  }

  test("manifest mode: compactFiles and diff work through manifest resolution") {
    import spark.implicits._
    VersionedTable.defaultMode = CommitMode.ManifestLog
    val root = java.nio.file.Files.createTempDirectory("mlog_cmp").toString + "/t"
    VersionedTable.commit(
      (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(8), root)
    val (newV, nBefore, nAfter) = VersionedTable.compactFiles(spark, root)
    assert(nBefore === 8 && nAfter === 1 && newV === 1L)
    assert(VersionedTable.read(spark, root).count() === 500L)
    VersionedTable.commit(
      ((2 to 500).map(i => (i.toLong, s"v$i")) :+ (501L -> "new"))
        .map { case (k, v) => (k, v) }.toDF("k", "v"), root)
    val changes = VersionedTable.diff(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes === Map(1L -> "delete", 501L -> "insert"))
  }
}
