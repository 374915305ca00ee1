package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL quantile sketch (Karnin, Lang, Liberty — FOCS'16), the
  * DataSketches-style streaming counterpart of [[QDigest]]: levelled
  * buffers where an item at level h carries weight 2^h, and an
  * over-full level sorts itself and promotes every other item one level
  * up (a "compaction"). Unlike the q-digest it needs no bounded integer
  * domain — it summarizes ANY ordered longs — and its footprint is
  * O(k·levels) items regardless of n, which is why the DataSketches
  * family is the de-facto publish format for cross-system quantile
  * interchange.
  *
  * Two deliberate deviations from the paper, both toward
  * reproducibility (the x175 gate discipline):
  *
  *   - DETERMINISTIC compaction: the paper flips a fair coin for the
  *     odd/even survivor parity; here the parity alternates via a
  *     per-sketch compaction counter. The paper's guarantee is
  *     probabilistic over the coin; the alternating schedule keeps the
  *     same telescoping-error structure (each compaction of c items at
  *     level h mis-ranks by at most 2^h·c/2 locally and alternation
  *     cancels consecutive halves) and makes a rebuild of the same
  *     stream byte-identical — worth more to a verified pipeline than
  *     the adversarial-input corner the coin defends.
  *   - Equal level capacity k (the paper shrinks lower levels
  *     geometrically): simpler, strictly MORE accurate at the same k,
  *     and the footprint stays k·log2(n/k) items — ~30 KB at k=512
  *     against a 100-TB stream, still a publishable blob.
  *
  * Merge concatenates level-wise and re-compacts over-full levels.
  * Because every compaction SORTS its buffer first, the survivor set is
  * a function of the level's multiset and the parity counter — not of
  * operand arrival order — so shuffle-order nondeterminism can shift an
  * estimate only within the compaction error itself. The x222 lane
  * therefore gates (the x175 convention) exact order-statistic legs by
  * hash plus boolean bound checks the twin pins TRUE, never the sketch
  * bytes.
  */
final case class KllSketch(k: Int, n: Long, compactions: Long,
    levels: Vector[Vector[Long]]) {

  /** Total weighted item count retained (= n when nothing was dropped —
    * compaction preserves total weight exactly: c items become c/2 items
    * of doubled weight, the odd leftover stays).
    */
  def weightedCount: Long =
    levels.zipWithIndex.map { case (b, h) => b.size.toLong << h }.sum

  def insert(v: Long): KllSketch =
    KllSketch(k, n + 1, compactions,
      if (levels.isEmpty) Vector(Vector(v))
      else levels.updated(0, levels(0) :+ v)).compactAll

  /** Level-wise concatenation + re-compaction; n adds exactly. */
  def merge(o: KllSketch): KllSketch = {
    require(o.k == k, "incompatible KLL sketches")
    val h = math.max(levels.size, o.levels.size)
    val joined = (0 until h).map { i =>
      levels.applyOrElse(i, (_: Int) => Vector.empty[Long]) ++
        o.levels.applyOrElse(i, (_: Int) => Vector.empty[Long])
    }.toVector
    KllSketch(k, n + o.n, compactions + o.compactions, joined).compactAll
  }

  /** Compact every over-full level bottom-up. Sort-first makes the
    * survivor set order-insensitive; the parity counter alternates which
    * half survives; an odd buffer leaves its minimum behind at the same
    * level so total weight is conserved.
    */
  private def compactAll: KllSketch = {
    var ls = levels
    var comp = compactions
    var h = 0
    while (h < ls.size) {
      if (ls(h).size > k) {
        val sorted = ls(h).sorted
        val keepOdd = (comp % 2L) == 1L
        val (stay, promotePool) =
          if (sorted.size % 2 == 1) (Vector(sorted.head), sorted.tail)
          else (Vector.empty[Long], sorted)
        val promoted = promotePool.zipWithIndex
          .collect { case (v, i) if (i % 2 == 1) == keepOdd => v }
        ls = ls.updated(h, stay)
        ls =
          if (h + 1 < ls.size) ls.updated(h + 1, ls(h + 1) ++ promoted)
          else ls :+ promoted
        comp += 1L
      }
      h += 1
    }
    KllSketch(k, n, comp, ls)
  }

  /** Smallest retained value whose cumulative weight reaches ⌈q·n⌉. */
  def quantile(q: Double): Long = {
    val target = math.max(1L, math.ceil(q * n).toLong)
    val weighted = levels.zipWithIndex
      .flatMap { case (b, h) => b.map(v => (v, 1L << h)) }
      .sortBy(_._1)
    var cum = 0L
    weighted.foreach { case (v, w) =>
      cum += w
      if (cum >= target) return v
    }
    weighted.lastOption.map(_._1).getOrElse(0L)
  }

  def toBytes: Array[Byte] = {
    val items = levels.map(_.size).sum
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 +
      levels.size * 4 + items * 8)
    bb.putInt(k); bb.putLong(n); bb.putLong(compactions)
    bb.putInt(levels.size)
    levels.foreach { b => bb.putInt(b.size); b.foreach(bb.putLong) }
    bb.array()
  }
}

object KllSketch {
  def empty(k: Int = 512): KllSketch = KllSketch(k, 0L, 0L, Vector.empty)

  def fromBytes(b: Array[Byte]): KllSketch = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val k = bb.getInt; val n = bb.getLong; val comp = bb.getLong
    val nl = bb.getInt
    val ls = Vector.fill(nl) {
      val sz = bb.getInt
      Vector.fill(sz)(bb.getLong)
    }
    KllSketch(k, n, comp, ls)
  }
}

/** Build a KLL sketch over long values (one blob per group). */
class KllAgg(k: Int = 512) extends Aggregator[Long, KllSketch, Array[Byte]] {
  override def zero: KllSketch = KllSketch.empty(k)
  override def reduce(b: KllSketch, v: Long): KllSketch = b.insert(v)
  override def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)
  override def finish(r: KllSketch): Array[Byte] = r.toBytes
  override def bufferEncoder: Encoder[KllSketch] = Encoders.kryo[KllSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union previously-built KLL blobs (the daily-partial merge). */
class KllMergeAgg extends Aggregator[Array[Byte], Option[KllSketch], Array[Byte]] {
  override def zero: Option[KllSketch] = None
  override def reduce(b: Option[KllSketch], blob: Array[Byte]): Option[KllSketch] = {
    val d = KllSketch.fromBytes(blob)
    Some(b.fold(d)(_.merge(d)))
  }
  override def merge(a: Option[KllSketch], b: Option[KllSketch]): Option[KllSketch] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x.merge(y))
      case (x, y) => x.orElse(y)
    }
  override def finish(r: Option[KllSketch]): Array[Byte] =
    r.getOrElse(KllSketch.empty()).toBytes
  override def bufferEncoder: Encoder[Option[KllSketch]] =
    Encoders.kryo[Option[KllSketch]]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
