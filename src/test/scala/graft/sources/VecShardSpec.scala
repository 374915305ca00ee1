package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the `vecshard` DataSource V2 connector: round-trip fidelity,
  * column-pruning (no vector bytes decoded for an id-only projection),
  * sidecar shard pruning under pushed vec_id ranges, and the scan's
  * self-description carrying the pushed filters.
  */
class VecShardSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("vecshard").toString
    val src = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .repartitionByRange(4, col("vec_id"))
    VecShard.writeShards(src, d)
    d
  }

  test("round-trip: every (vec_id, embedding) survives the binary format bitwise") {
    val back = VecShard.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val orig = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(back.keySet == orig.keySet)
    orig.foreach { case (id, v) => assert(back(id) == v, s"vector $id differs") }
  }

  test("column pruning: an id-only projection decodes zero vector bytes") {
    VecShard.vectorBytesDecoded.set(0L)
    val n = VecShard.read(spark, dir).select("vec_id").collect().length
    assert(n > 0)
    assert(VecShard.vectorBytesDecoded.get() == 0L,
      "pruned scan must skip the float payload entirely")
    // and a full read does decode
    VecShard.read(spark, dir).select("embedding").collect(): Unit
    assert(VecShard.vectorBytesDecoded.get() > 0L)
  }

  test("shard pruning: a pushed vec_id range opens only overlapping shards") {
    val metas = VecShard.listShards(dir)
    assert(metas.length == 4, "range-partitioned write should land 4 shards")
    // ids are range-partitioned, so a tight range hits exactly one shard
    val probe = metas.head
    VecShard.filesOpened.set(0L)
    val got = VecShard.read(spark, dir)
      .filter(col("vec_id") >= probe.minId && col("vec_id") <= probe.minId + 1)
      .collect()
    assert(got.nonEmpty)
    assert(VecShard.filesOpened.get() == 1L,
      s"expected 1 shard opened, got ${VecShard.filesOpened.get()}")
    // correctness never rides the pruning: the residual filter re-applies
    assert(got.forall { r =>
      val id = r.getLong(0); id >= probe.minId && id <= probe.minId + 1
    })
  }

  test("scan description and plan carry the pushed filters and pruned schema") {
    val df = VecShard.read(spark, dir).filter(col("vec_id") < 10L).select("vec_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("VecShardScan"), s"custom scan missing in:\n$plan")
    assert(plan.contains("PushedFilters: [LessThan(vec_id,10)]")
      || plan.contains("LessThan(vec_id,10)"), s"pushed filter missing in:\n$plan")
    assert(df.collect().forall(_.getLong(0) < 10L))
    assert(df.schema.fieldNames.toSeq == Seq("vec_id"))
  }

  test("aggregate pushdown: COUNT/MIN/MAX answer from sidecars with zero file opens") {
    val agg = VecShard.read(spark, dir)
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("lo"), max(col("vec_id")).as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("VecShardAggScan"), s"stats-only scan missing in:\n$plan")
    VecShard.filesOpened.set(0L)
    VecShard.vectorBytesDecoded.set(0L)
    val row = agg.collect().head
    assert(VecShard.filesOpened.get() == 0L, "aggregate scan must open no data file")
    assert(VecShard.vectorBytesDecoded.get() == 0L)
    val ref = spark.read.parquet(s"$Sf/embeddings.parquet")
      .agg(count(lit(1)), min(col("vec_id")), max(col("vec_id"))).collect().head
    assert(row.getLong(0) == ref.getLong(0))
    assert(row.getLong(1) == ref.getLong(1))
    assert(row.getLong(2) == ref.getLong(2))
  }

  test("aggregate pushdown is metadata-only: correct even when payloads are unreadable") {
    // copy the sidecars but truncate every data file to zero bytes: a scan
    // that touched ANY vector byte would fail, so a correct COUNT/MIN/MAX
    // proves the aggregate path reads footers alone
    val gutted = java.nio.file.Files.createTempDirectory("vecshard_gutted").toString
    new java.io.File(dir).listFiles().foreach { f =>
      val dst = new java.io.File(gutted, f.getName)
      if (f.getName.endsWith(".meta"))
        java.nio.file.Files.copy(f.toPath, dst.toPath): Unit
      else { dst.createNewFile(): Unit } // 0-byte .vec stub
    }
    val row = VecShard.read(spark, gutted)
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("lo"), max(col("vec_id")).as("hi"))
      .collect().head
    val ref = spark.read.parquet(s"$Sf/embeddings.parquet")
      .agg(count(lit(1)), min(col("vec_id")), max(col("vec_id"))).collect().head
    assert(row.getLong(0) == ref.getLong(0) && row.getLong(1) == ref.getLong(1) &&
      row.getLong(2) == ref.getLong(2))
    // and the row path genuinely needs the payload: a full read must fail
    intercept[Throwable] { VecShard.read(spark, gutted).collect() }
  }

  test("aggregate pushdown declines filters, grouping, and embedding aggregates") {
    // a residual filter between scan and aggregate → row path, still correct
    val filtered = VecShard.read(spark, dir).filter(col("vec_id") >= 10L)
      .agg(count(lit(1)).as("n"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("VecShardAggScan"))
    val refN = spark.read.parquet(s"$Sf/embeddings.parquet")
      .filter(col("vec_id") >= 10L).count()
    assert(filtered.collect().head.getLong(0) == refN)
    // grouped aggregate → row path
    val grouped = VecShard.read(spark, dir).groupBy(col("vec_id") % 2)
      .agg(count(lit(1)))
    assert(!grouped.queryExecution.executedPlan.toString.contains("VecShardAggScan"))
    assert(grouped.collect().map(_.getLong(1)).sum ==
      spark.read.parquet(s"$Sf/embeddings.parquet").count())
    // an aggregate the sidecar cannot answer → row path
    val sizes = VecShard.read(spark, dir).agg(min(size(col("embedding"))))
    assert(!sizes.queryExecution.executedPlan.toString.contains("VecShardAggScan"))
    assert(sizes.collect().head.getInt(0) > 0)
  }

  test("the shortName registration resolves: format(\"vecshard\") works") {
    val n = spark.read.format("vecshard").option("path", dir).load().count()
    assert(n == spark.read.parquet(s"$Sf/embeddings.parquet").count())
  }

  test("DSv2 write path: append round-trips and overwrite truncates atomically") {
    val out = java.nio.file.Files.createTempDirectory("vecshard_w").toString
    val src = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val lo = src.filter(col("vec_id") < 25L)
    val hi = src.filter(col("vec_id") >= 25L)
    lo.write.format("vecshard").mode("append").save(out)
    hi.write.format("vecshard").mode("append").save(out)
    val all = VecShard.read(spark, out).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val orig = src.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(all == orig, "two appends must union to the source")
    // every published shard carries its sidecar (the invisible-until-meta
    // publish contract)
    val files = new java.io.File(out).listFiles().map(_.getName).toSet
    files.filter(_.endsWith(".vec")).foreach(f =>
      assert(files(f + ".meta"), s"$f missing sidecar"))
    assert(!files.exists(_.endsWith(".tmp")), "no tmp residue after commit")
    // overwrite replaces the table contents, not unions
    lo.write.format("vecshard").mode("overwrite").save(out)
    val after = VecShard.read(spark, out).collect().map(_.getLong(0)).toSet
    assert(after == orig.keySet.filter(_ < 25L), "overwrite must truncate")
  }
}
