package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Pin.PinOps

/** Insert-only incremental view maintenance for JOIN views (the
  * counting-free case of Blakeley, Larson & Tompa, SIGMOD 1986): for
  * V = A ⋈ B under append-only deltas,
  *
  *   ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * over the PRE-batch snapshots, and V_new = V_old ∪ ΔV — no row of
  * the standing view is ever recomputed. The aggregate counterpart
  * (count/sum partials) landed in round 3 (`Incremental`); this is the
  * join counterpart a warehouse needs to keep wide denormalized views
  * current without nightly rebuilds.
  *
  * Scale shape: each term is one key-partitioned equi-join where ONE
  * side is batch-sized — the standing side never reshuffles if it is
  * bucketed on the join key (engine/Bucketing), and ΔA ⋈ ΔB is
  * batch × batch. Work per batch is O(|Δ| · match-fanout), independent
  * of |V|.
  *
  * The x202 gate replays a 3-way batch split of lineitem/orders through
  * this maintenance and hash-compares against the monolithic join (the
  * DuckDB oracle IS the rebuild), so "maintained == rebuilt" is checked
  * bit-for-bit, not asserted.
  */
object IncrementalView {

  /** One maintenance step: the delta of V = A ⋈_keys B when `aDelta`
    * and `bDelta` arrive atop snapshots `aOld`/`bOld`. Insert-only:
    * callers append the result to the standing view.
    */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame, bOld: DataFrame,
      bDelta: DataFrame, keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** Fold a sequence of (ΔA, ΔB) batches into the maintained view.
    * Snapshots advance by union; per-batch localCheckpoint keeps the
    * unrolled lineage linear (the x82 discipline).
    */
  def maintain(batches: Seq[(DataFrame, DataFrame)],
      keys: Seq[String]): DataFrame = {
    require(batches.nonEmpty)
    val (a0, b0) = batches.head
    // r19 optimization round: snapshots advance as a UNION OF THE
    // ALREADY-PINNED batch frames instead of re-checkpointing the whole
    // accumulated side per fold — the old shape rewrote O(|A|) blocks per
    // batch (and pinned a final snapshot no term ever consumes). The
    // union of k pinned deltas has flat lineage (k ExistingRDD scans),
    // so the per-batch pin of the delta alone keeps the unrolled plan
    // linear; the standing-side CONTENT of every join term is
    // unchanged. At production batch counts the standing side is the
    // bucketed table (see the scale note above), not a growing union.
    var aParts = Vector.empty[DataFrame]
    var bParts = Vector.empty[DataFrame]
    val aEmpty = a0.filter(lit(false))
    val bEmpty = b0.filter(lit(false))
    var view: DataFrame = null
    batches.foreach { case (aD, bD) =>
      val a = aD.pinned
      val b = bD.pinned
      val aOld = if (aParts.isEmpty) aEmpty else aParts.reduce(_ unionByName _)
      val bOld = if (bParts.isEmpty) bEmpty else bParts.reduce(_ unionByName _)
      val dv = deltaJoin(aOld, a, bOld, b, keys)
      view = if (view == null) dv else view.unionByName(dv)
      aParts :+= a
      bParts :+= b
    }
    view
  }
}
