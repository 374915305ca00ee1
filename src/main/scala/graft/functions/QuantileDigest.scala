package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** q-digest (Shrivastava, Buragohain, Agrawal, Suri — SenSys'04): a
  * deterministic, MERGEABLE ε-approximate quantile summary over an
  * integer domain [0, 2^bits) — the persistable quantile counterpart of
  * q50's HLL daily partials. Spark's `percentile_approx` answers one
  * query; it cannot be stored per-partition and unioned later. This
  * digest can: a daily pipeline persists one small byte blob per day and
  * answers running quantiles from blob unions, never re-reading history.
  *
  * Structure: counts on nodes of the complete binary tree over the
  * domain (heap ids — root 1, leaf for value v = 2^bits + v). The
  * compress pass walks levels bottom-up and folds any family whose
  * (left + right + parent) total stays under ⌊n/σ⌋ into the parent —
  * families are disjoint, so within-level order is irrelevant and the
  * result is a pure function of (counts, n). Rank error of a quantile
  * read is bounded by the ancestor slack: ≤ bits·n/σ (σ=2000, bits=17
  * ⇒ <0.9% — an order of magnitude inside the ±5% gate windows).
  *
  * Merge discipline: `merge` is COUNT ADDITION ONLY — commutative and
  * associative, so the digest survives Spark's nondeterministic shuffle
  * fetch order (the property that lets q50's HLL union gate
  * deterministically; a compress inside `merge` would trade it away).
  * Compression happens at a fixed per-partition cadence inside `reduce`
  * (deterministic: partition row order) and once in `finish`. Merged
  * buffer size is therefore Σ partial sizes — bounded by
  * partitions·σ·bits, kilobytes at any scale.
  */
final case class QDigest(bits: Int, sigma: Int, n: Long, counts: Map[Int, Long]) {

  private def cap: Long = math.max(1L, n / sigma)

  /** Fold small families into parents, bottom-up; pure in (counts, n). */
  def compress: QDigest = {
    var m = counts
    var level = bits // leaves live at ids [2^bits, 2^(bits+1))
    while (level >= 1) {
      val lo = 1 << level
      val hi = 1 << (level + 1)
      val ids = m.keysIterator.filter(id => id >= lo && id < hi).toArray.sorted
      val seen = new scala.collection.mutable.HashSet[Int]
      ids.foreach { id =>
        val left = id & ~1
        if (!seen(left)) {
          seen += left
          val right = left | 1
          val parent = left >> 1
          val total = m.getOrElse(left, 0L) + m.getOrElse(right, 0L) +
            m.getOrElse(parent, 0L)
          if (total < cap) {
            if (total > 0L) m = m.updated(parent, total) else m = m - parent
            m = m - left - right
          }
        }
      }
      level -= 1
    }
    QDigest(bits, sigma, n, m)
  }

  def insert(v: Long, c: Long = 1L): QDigest = {
    // clamp into the domain: a stray out-of-range value saturates at the
    // boundary instead of corrupting the tree
    val vc = math.min(math.max(v, 0L), (1L << bits) - 1L)
    val leaf = (1 << bits) + vc.toInt
    QDigest(bits, sigma, n + c, counts.updated(leaf, counts.getOrElse(leaf, 0L) + c))
  }

  /** Count addition — commutative/associative, no compression. */
  def add(o: QDigest): QDigest = {
    require(o.bits == bits && o.sigma == sigma, "incompatible digests")
    val m = o.counts.foldLeft(counts) { case (acc, (id, c)) =>
      acc.updated(id, acc.getOrElse(id, 0L) + c)
    }
    QDigest(bits, sigma, n + o.n, m)
  }

  private def levelOf(id: Int): Int = 31 - Integer.numberOfLeadingZeros(id)

  /** Node value range [lb, ub] in the domain. */
  private def range(id: Int): (Long, Long) = {
    val l = levelOf(id)
    val span = 1L << (bits - l)
    val lb = (id.toLong - (1L << l)) * span
    (lb, lb + span - 1)
  }

  /** The classic read: nodes in (ub, lb) ascending order, cumulative
    * count; report the ub of the node where the cumulative first
    * reaches ⌈q·n⌉. Rank error ≤ bits·n/σ.
    */
  def quantile(q: Double): Long = {
    val target = math.max(1L, math.ceil(q * n).toLong)
    val ordered = counts.toSeq
      .map { case (id, c) => val (lb, ub) = range(id); (ub, lb, c) }
      .sortBy { case (ub, lb, _) => (ub, lb) }
    var cum = 0L
    ordered.foreach { case (ub, _, c) =>
      cum += c
      if (cum >= target) return ub
    }
    ordered.lastOption.map(_._1).getOrElse(0L)
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 4 + counts.size * 12)
    bb.putInt(bits); bb.putInt(sigma); bb.putLong(n); bb.putInt(counts.size)
    counts.toSeq.sortBy(_._1).foreach { case (id, c) => bb.putInt(id); bb.putLong(c) }
    bb.array()
  }
}

object QDigest {
  def empty(bits: Int = 17, sigma: Int = 2000): QDigest =
    QDigest(bits, sigma, 0L, Map.empty)

  def fromBytes(b: Array[Byte]): QDigest = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val bits = bb.getInt; val sigma = bb.getInt; val n = bb.getLong
    val sz = bb.getInt
    val m = (0 until sz).map(_ => bb.getInt -> bb.getLong).toMap
    QDigest(bits, sigma, n, m)
  }
}

final case class QDigestBuf(d: QDigest, pending: Int)

/** Build a q-digest over quantized long values (one per group). */
class QDigestAgg(bits: Int = 17, sigma: Int = 2000)
    extends Aggregator[Long, QDigestBuf, Array[Byte]] {
  private val CompressEvery = 4096
  override def zero: QDigestBuf = QDigestBuf(QDigest.empty(bits, sigma), 0)
  override def reduce(b: QDigestBuf, v: Long): QDigestBuf = {
    val d = b.d.insert(v)
    if (b.pending + 1 >= CompressEvery) QDigestBuf(d.compress, 0)
    else QDigestBuf(d, b.pending + 1)
  }
  override def merge(a: QDigestBuf, b: QDigestBuf): QDigestBuf =
    QDigestBuf(a.d.add(b.d), 0) // addition only: order-insensitive
  override def finish(r: QDigestBuf): Array[Byte] = r.d.compress.toBytes
  override def bufferEncoder: Encoder[QDigestBuf] = Encoders.kryo[QDigestBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union previously-built digest blobs (the daily-partial merge). */
class QDigestMergeAgg extends Aggregator[Array[Byte], QDigestBuf, Array[Byte]] {
  override def zero: QDigestBuf = QDigestBuf(QDigest.empty(), -1)
  override def reduce(b: QDigestBuf, blob: Array[Byte]): QDigestBuf = {
    val d = QDigest.fromBytes(blob)
    if (b.pending == -1) QDigestBuf(d, 0) else QDigestBuf(b.d.add(d), 0)
  }
  override def merge(a: QDigestBuf, b: QDigestBuf): QDigestBuf =
    if (a.pending == -1) b
    else if (b.pending == -1) a
    else QDigestBuf(a.d.add(b.d), 0)
  override def finish(r: QDigestBuf): Array[Byte] =
    (if (r.pending == -1) QDigest.empty() else r.d).compress.toBytes
  override def bufferEncoder: Encoder[QDigestBuf] = Encoders.kryo[QDigestBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
