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
      ds.checkpoint(eager)
  }

  /** `.pinned` / `.pinnedLazy` postfix syntax — the drop-in spelling
    * for what used to be `.localCheckpoint(true)` / `(false)`.
    */
  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned: Dataset[T] = pin(ds, eager = true)
    def pinnedLazy: Dataset[T] = pin(ds, eager = false)
  }
}
