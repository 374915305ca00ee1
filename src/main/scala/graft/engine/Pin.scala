package graft.engine

import org.apache.spark.sql.Dataset

/** The ONE materialization seam every iterative/multi-consumer operator
  * pins its intermediates through (instead of 100+ scattered
  * `localCheckpoint` calls): `Pin.pin(df)` or the `.pinned` extension.
  *
  * Why a seam: `localCheckpoint` stores blocks on EXECUTORS. On
  * local[32] that is free and fast — and it is also the only mode a
  * single-JVM test run can observe. On a real cluster, an executor loss
  * (preemption is routine at 100-TB fleet sizes) unrecoverably fails
  * every query holding local-checkpoint blocks on it, because the
  * lineage was truncated and the blocks are not replicated. Reliable
  * mode routes the same call sites through `Dataset.checkpoint` — the
  * HDFS/object-store checkpoint that survives executor loss — at the
  * cost of a write+read round trip per pin. A deployment flips ONE
  * switch at startup:
  *
  * {{{
  *   spark.sparkContext.setCheckpointDir("hdfs:///jobs/ckpt")
  *   graft.engine.Pin.mode = graft.engine.Pin.Reliable
  * }}}
  *
  * The two modes are output-identical (PinSpec runs a representative
  * iterative lane in both and compares bitwise); only the failure
  * domain and the pin cost differ. Default stays Local: correct and
  * fastest wherever executors are stable (local mode, on-prem static
  * clusters), and the right benchmark posture.
  */
object Pin {

  sealed trait Mode

  /** Executor-block-resident pinning (`localCheckpoint`): no external
    * storage, fastest; blocks die with their executor.
    */
  case object Local extends Mode

  /** Reliable checkpoint (`Dataset.checkpoint`) to the context's
    * checkpoint dir: survives executor loss; costs one distributed
    * write + read per pin.
    */
  case object Reliable extends Mode

  @volatile var mode: Mode = Local

  /** Reliable-mode checkpoint retirement age, in millis; negative
    * disables (the default). Spark never deletes reliable checkpoint
    * dirs itself (`rdd-<id>` under the context's checkpoint dir), so a
    * long-running Reliable deployment accumulates one per pin,
    * unboundedly. With a TTL set, every Reliable pin opportunistically
    * sweeps the CURRENT context's `rdd-*` dirs older than the TTL —
    * the same age-gated contract as
    * [[graft.streaming.SnapshotIngest.baseVacuumGraceMillis]]: pick a
    * TTL longer than any job still holding a pinned frame, because a
    * swept checkpoint fails that frame's next action (exactly Delta's
    * vacuum-vs-reader contract).
    */
  @volatile var reliableTtlMillis: Long = -1L

  /** Sweep aged reliable checkpoints of THIS context; returns the dirs
    * removed. Safe to call any time; a no-op when no checkpoint dir is
    * set. Only `rdd-*` children older than `ttlMillis` go — other
    * contexts' UUID dirs (possibly live) are never touched.
    */
  def vacuumReliable(spark: org.apache.spark.sql.SparkSession,
      ttlMillis: Long): Seq[String] =
    spark.sparkContext.getCheckpointDir.toSeq.flatMap { dirStr =>
      try {
        val p = new org.apache.hadoop.fs.Path(dirStr)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) Seq.empty
        else {
          val cutoff = System.currentTimeMillis() - ttlMillis
          fs.listStatus(p).toSeq
            .filter(st => st.isDirectory &&
              st.getPath.getName.startsWith("rdd-") &&
              st.getModificationTime < cutoff)
            .flatMap { st =>
              if (fs.delete(st.getPath, true)) Some(st.getPath.toString)
              else None
            }
        }
      } catch { case _: java.io.IOException => Seq.empty }
    }

  /** Pin `ds`: truncate lineage and materialize (eager) so iterative
    * rounds and multi-consumer plans never replay upstream work.
    */
  def pin[T](ds: Dataset[T]): Dataset[T] = pin(ds, eager = true)

  def pin[T](ds: Dataset[T], eager: Boolean): Dataset[T] = mode match {
    case Local => ds.localCheckpoint(eager)
    case Reliable =>
      if (ds.sparkSession.sparkContext.getCheckpointDir.isEmpty)
        throw new IllegalStateException(
          "Pin.mode = Reliable requires a checkpoint dir: call " +
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) " +
            "at startup (HDFS or an object store — NOT local disk, which " +
            "dies with the node).")
      val out = ds.checkpoint(eager)
      if (reliableTtlMillis >= 0L)
        vacuumReliable(ds.sparkSession, reliableTtlMillis): Unit
      out
  }

  /** `.pinned` / `.pinnedLazy` postfix syntax — the drop-in spelling
    * for what used to be `.localCheckpoint(true)` / `(false)`.
    */
  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned: Dataset[T] = pin(ds, eager = true)
    def pinnedLazy: Dataset[T] = pin(ds, eager = false)
  }
}
