package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reliable-checkpoint seam ([[Pin]]): every iterative operator's
  * lineage pinning routes through ONE switch, because `localCheckpoint`
  * blocks live on executors and die with them — at 100-TB fleet sizes
  * (routine preemption) a mid-pipeline executor loss must degrade to
  * recompute, not query failure. Pins:
  *
  *   - Local and Reliable modes are OUTPUT-IDENTICAL on a representative
  *     iterative lane (connected components over the near-dup pair
  *     graph — per-round pins, the x47 engine);
  *   - Reliable without a checkpoint dir fails fast with the remedy;
  *   - no call site bypasses the seam (`scripts/pin_rewrite.py` asserts
  *     zero direct localCheckpoint calls in src/main outside Pin.scala;
  *     re-run it after adding code).
  */
class PinSpec extends SparkSpec {

  import spark.implicits._

  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val before = Pin.mode
    try super.withFixture(test)
    finally Pin.mode = before
  }

  test("Reliable mode without a checkpoint dir fails fast with the remedy") {
    // isolate: the shared session may already have a dir from another
    // test — build the failure on a context state we control
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "another suite already set a checkpoint dir on the shared context")
    Pin.mode = Pin.Reliable
    val boom = intercept[IllegalStateException] {
      Pin.pin(Seq(1L, 2L).toDF("id"))
    }
    assert(boom.getMessage.contains("setCheckpointDir"))
  }

  test("Local and Reliable pin to identical results on an iterative lane") {
    val pairs = Seq( // two components: a 5-chain and a triangle
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")

    Pin.mode = Pin.Local
    val local = graft.ext.ExtTestAccess.connectedComponents(pairs)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    Pin.mode = Pin.Reliable
    val reliable = graft.ext.ExtTestAccess.connectedComponents(pairs)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(local === reliable, "the two pin modes must be output-identical")
    assert(local.toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("Reliable checkpoints are age-gated vacuumed (TTL hygiene)") {
    // Spark never deletes reliable checkpoint dirs itself — a
    // long-running Reliable deployment leaks one rdd-* dir per pin
    val ttlBefore = Pin.reliableTtlMillis
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_ttl")
      spark.sparkContext.setCheckpointDir(ckpt.toString)
      Pin.mode = Pin.Reliable
      val resolved = new java.io.File(
        spark.sparkContext.getCheckpointDir.get.stripPrefix("file:"))
      def rddDirs() = Option(resolved.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
      val first = Pin.pin(Seq(1L, 2L, 3L).toDF("id"))
      assert(first.count() === 3L)
      assert(rddDirs().nonEmpty, "a Reliable pin must leave a checkpoint dir")
      // age the first pin's dir past the TTL
      rddDirs().foreach { d =>
        assert(d.setLastModified(System.currentTimeMillis() - 2L * 3600_000L))
      }
      Pin.reliableTtlMillis = 3600_000L
      val second = Pin.pin(Seq(4L, 5L).toDF("id"))
      assert(second.count() === 2L)
      val left = rddDirs()
      assert(left.length === 1,
        s"the aged checkpoint must be swept, the young one kept: ${left.mkString(",")}")
      assert(left.head.lastModified() > System.currentTimeMillis() - 3600_000L)
      assert(second.count() === 2L, "the surviving pin must stay readable")
      // disarmed (TTL < 0): nothing is ever swept
      Pin.reliableTtlMillis = -1L
      rddDirs().foreach { d =>
        assert(d.setLastModified(System.currentTimeMillis() - 2L * 3600_000L))
      }
      Pin.pin(Seq(6L).toDF("id")).count(): Unit
      assert(rddDirs().length === 2, "TTL off means no sweep")
    } finally Pin.reliableTtlMillis = ttlBefore
  }

  test("a real query lane is mode-invariant end-to-end (x217 ED clusters)") {
    Pin.mode = Pin.Local
    val local = graft.ext.Linkage.edClusters(spark, Sf)
      .collect().map(_.toString).toSeq
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft_ckpt2").toString)
    Pin.mode = Pin.Reliable
    val reliable = graft.ext.Linkage.edClusters(spark, Sf)
      .collect().map(_.toString).toSeq
    assert(local === reliable)
    assert(local.nonEmpty, "the fixture corpus must produce clusters")
  }
}
