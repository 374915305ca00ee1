package graft.engine

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** VersionedTable contracts: monotonic version publish, time-travel
  * reads, invisibility of uncommitted writers, and bounded retention.
  */
class VersionedTableSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vtable").toString + "/t"

  test("commit numbers versions 0,1,2 and read time-travels exactly") {
    import spark.implicits._
    val root = tmpRoot()
    assert(VersionedTable.versions(spark, root).isEmpty)
    val v0 = VersionedTable.commit(Seq((1L, "a")).toDF("id", "v"), root)
    val v1 = VersionedTable.commit(Seq((1L, "b"), (2L, "b")).toDF("id", "v"), root)
    val v2 = VersionedTable.commit(Seq((9L, "c")).toDF("id", "v"), root)
    assert((v0, v1, v2) == ((0L, 1L, 2L)))
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(VersionedTable.latestVersion(spark, root).contains(2L))
    // latest is v2; asOf pins any committed snapshot
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(VersionedTable.read(spark, root, Some(0L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
    assert(VersionedTable.read(spark, root, Some(1L)).count() == 2L)
  }

  test("a crashed writer's tmp dir is invisible and never becomes a version") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "v"), root)
    // simulate a writer that died before publishing: data present under a
    // dot-prefixed tmp dir
    Seq((666L, "dead")).toDF("id", "v")
      .write.parquet(s"$root/.tmp-v1-deadbeef")
    assert(VersionedTable.versions(spark, root) == Seq(0L),
      "uncommitted tmp must not list as a version")
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the next real commit publishes v1 regardless of the corpse
    val v = VersionedTable.commit(Seq((2L, "b")).toDF("id", "v"), root)
    assert(v == 1L)
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("commit skips over a version published by a racing writer") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "v"), root)
    // another writer published v=1 between our listing and rename: the
    // rename target exists, so commit must land at v=2, not clobber v=1
    Seq((50L, "other")).toDF("id", "v").write.parquet(s"$root/v=1")
    val v = VersionedTable.commit(Seq((2L, "b")).toDF("id", "v"), root)
    assert(v == 2L)
    assert(VersionedTable.read(spark, root, Some(1L)).collect()
      .map(_.getLong(0)).toSeq == Seq(50L), "racing writer's snapshot intact")
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("concurrent commits win distinct versions, nothing buried (nonce arbitration)") {
    import spark.implicits._
    val root = tmpRoot()
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
      assert(won.toSet == (0L until n.toLong).toSet,
        s"each writer must win a distinct consecutive version, got $won")
      // every version holds exactly its winner's single row — a buried
      // rename (Hadoop rename-into-existing-dir) would corrupt this
      (0 until n).foreach { i =>
        val rows = VersionedTable.read(spark, root, Some(won(i))).collect()
        assert(rows.length == 1 && rows(0).getString(1) == s"w$i",
          s"version ${won(i)} must hold writer $i's snapshot only")
      }
      // no version dir may contain a buried loser's tmp child
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      VersionedTable.versions(spark, root).foreach { v =>
        val children = fs.listStatus(new Path(s"$root/v=$v"))
          .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
        assert(children.isEmpty, s"v=$v contains buried snapshots: ${children.toSeq}")
      }
    } finally pool.shutdown()
  }

  test("racing commitIfAbsent replays: exactly one wins, no buried copies") {
    import spark.implicits._
    val root = tmpRoot()
    val n = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            VersionedTable.commitIfAbsent(
              Seq((i.toLong, s"r$i")).toDF("id", "w"), root, 7L)
        })
      }
      val wins = futures.map(_.get())
      assert(wins.count(identity) == 1,
        s"exactly one replay must publish version 7, got $wins")
      val rows = VersionedTable.read(spark, root, Some(7L)).collect()
      assert(rows.length == 1, "the committed snapshot is one writer's data")
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val leftovers = fs.listStatus(new Path(s"$root/v=7"))
        .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
      assert(leftovers.isEmpty, s"buried loser snapshots present: ${leftovers.toSeq}")
    } finally pool.shutdown()
  }

  test("compactFiles rewrites the latest snapshot into fewer files, data identical") {
    import spark.implicits._
    val root = tmpRoot()
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    VersionedTable.commit(df.repartition(16), root)
    val before = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (newV, nBefore, nAfter) =
      VersionedTable.compactFiles(spark, root) // tiny bytes -> 1 file
    assert(nBefore === 16)
    assert(nAfter === 1)
    assert(newV === 1L)
    val after = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after === before)
    // the fragmented version is still time-travelable until vacuumed
    assert(VersionedTable.read(spark, root, Some(0L)).count() === 1000L)
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(VersionedTable.versions(spark, root) === Seq(1L))
  }

  test("deleteWhere publishes a new version; the forget completes at vacuum") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.commit(
      Seq((1L, "keep"), (2L, "forget"), (3L, "keep")).toDF("id", "v"), root)
    val v = VersionedTable.deleteWhere(spark, root, col("id") === 2L)
    assert(v == 1L)
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L), "latest no longer has the row")
    assert(VersionedTable.read(spark, root, Some(0L)).count() == 3L,
      "pinned readers still see the pre-delete snapshot")
    val removed = VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(removed == Seq(0L), "vacuum retires the snapshot that held the data")
    assert(VersionedTable.versions(spark, root) == Seq(1L))
  }

  test("diff emits exactly the inserted, deleted, and updated keys") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), root)
    VersionedTable.commit(
      Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("id", "v"), root)
    val changes = VersionedTable.diff(spark, root, 0L, 1L, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes == Map(1L -> "delete", 3L -> "update", 4L -> "insert"),
      s"unchanged key 2 must be absent: $changes")
  }

  test("vacuum drops only the oldest versions and keeps reads working") {
    import spark.implicits._
    val root = tmpRoot()
    (0 until 4).foreach(i => VersionedTable.commit(Seq((i.toLong, s"v$i")).toDF("id", "v"), root))
    val removed = VersionedTable.vacuum(spark, root, keepLast = 2)
    assert(removed == Seq(0L, 1L))
    assert(VersionedTable.versions(spark, root) == Seq(2L, 3L))
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(3L))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(0L))
    }
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/v=0")) && fs.exists(new Path(s"$root/v=2")))
  }
}
