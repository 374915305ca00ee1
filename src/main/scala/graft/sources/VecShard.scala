package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `vecshard` — a DataSource V2 connector for a fixed-record binary
  * embedding-shard format, the artifact an ANN serving pipeline persists
  * next to its index: per record, one little-endian int64 `vec_id`
  * followed by `dim` little-endian float32s. Parquet already serves the
  * analytic lanes; this connector exists because a SERVING shard wants
  * zero-decode mmap-ability (fixed stride, no page/dictionary machinery),
  * and because the engine should demonstrate the full custom-connector
  * surface Spark offers rather than only consuming built-ins.
  *
  * Spark-native surface implemented:
  *   - `TableProvider` → `Table` → `ScanBuilder` → `Batch`, one
  *     `InputPartition` per shard file (a shard is the parallelism unit,
  *     exactly like a parquet row-group split at cluster scale);
  *   - `SupportsPushDownRequiredColumns`: projecting only `vec_id`
  *     skips the Float-array decode entirely (the reader seeks over the
  *     vector bytes — at 100 TB that is the difference between reading
  *     8 bytes and 8+4·dim bytes per row);
  *   - `SupportsPushDownFilters`: `vec_id` range/equality predicates
  *     prune WHOLE SHARDS via each file's sidecar min/max footer (the
  *     parquet row-group-statistics idea) and short-circuit the
  *     per-record decode. Filters are conservatively reported back as
  *     residual — Spark re-applies them, so a sidecar lost in transit
  *     can only cost performance, never correctness.
  *
  * The format is deliberately append-only and self-describing (sidecar
  * `.meta` per shard: count, dim, minId, maxId); shards from different
  * writers merge by directory union, the same contract as parquet part
  * files.
  */
class VecShard extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "vecshard"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = VecShard.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new VecShardTable(properties.get("path"))
}

object VecShard {
  val Schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Test/ops observability: bytes of vector payload actually decoded and
    * shard files actually opened — the counters the pruning specs pin.
    */
  val vectorBytesDecoded = new AtomicLong(0L)
  val filesOpened = new AtomicLong(0L)

  /** Write `df` (vec_id: long, embedding: array<float>) as one shard per
    * partition under `path`. Executor-side streams via java.io against
    * the shared filesystem — the local[N] stand-in for the Hadoop
    * FileSystem API a cluster deployment swaps in (same stream contract).
    * Records write in partition order; the sidecar records count/dim and
    * the id min/max the scan prunes on.
    */
  def writeShards(df: DataFrame, path: String): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    df.select("vec_id", "embedding").rdd
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .foreachPartition { it: Iterator[(Long, Array[Float])] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.toArray
        if (rows.nonEmpty) {
          val dim = rows.head._2.length
          require(rows.forall(_._2.length == dim), "ragged embedding widths in one shard")
          val f = new File(dir, f"shard-$pid%05d.vec")
          val out = new DataOutputStream(new java.io.BufferedOutputStream(new FileOutputStream(f)))
          val buf = ByteBuffer.allocate(8 + 4 * dim).order(ByteOrder.LITTLE_ENDIAN)
          try rows.foreach { case (id, v) =>
            buf.clear(); buf.putLong(id); v.foreach(buf.putFloat)
            out.write(buf.array(), 0, buf.position())
          } finally out.close()
          val meta = new java.io.PrintWriter(new File(dir, f.getName + ".meta"))
          try meta.println(s"${rows.length} $dim ${rows.map(_._1).min} ${rows.map(_._1).max}")
          finally meta.close()
        }
      }
  }

  /** Convenience reader: `spark.read.format(classOf[VecShard].getName)`. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(classOf[VecShard].getName).option("path", path).load()

  private[sources] final case class ShardMeta(file: String, count: Int, dim: Int,
      minId: Long, maxId: Long)

  private[sources] def listShards(path: String): Seq[ShardMeta] = {
    val dir = new File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".vec")).sortBy(_.getName)
    files.toSeq.map { f =>
      val metaF = new File(dir, f.getName + ".meta")
      val parts = scala.io.Source.fromFile(metaF).mkString.trim.split(" ")
      ShardMeta(f.getAbsolutePath, parts(0).toInt, parts(1).toInt,
        parts(2).toLong, parts(3).toLong)
    }
  }

  /** The [lo, hi] id interval implied by the pushed vec_id filters
    * (unbounded sides = Long.Min/MaxValue).
    */
  private[sources] def idBounds(filters: Array[Filter]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case EqualTo("vec_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("vec_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("vec_id", v: Long) => lo = math.max(lo, v)
      case LessThan("vec_id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("vec_id", v: Long) => hi = math.min(hi, v)
      case _ => ()
    }
    (lo, hi)
  }

  private[sources] def supported(f: Filter): Boolean = f match {
    case EqualTo("vec_id", _: Long) | GreaterThan("vec_id", _: Long) |
         GreaterThanOrEqual("vec_id", _: Long) | LessThan("vec_id", _: Long) |
         LessThanOrEqual("vec_id", _: Long) => true
    case _ => false
  }

  /** Which sidecar statistic answers a pushed aggregate column. */
  private[sources] sealed trait AggTag extends Serializable
  private[sources] case object AggCount extends AggTag
  private[sources] case object AggMin extends AggTag
  private[sources] case object AggMax extends AggTag
}

private[sources] class VecShardTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"vecshard($path)"
  override def schema(): StructType = VecShard.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VecShardScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new VecShardWriteBuilder(path, info.schema())
}

private[sources] class VecShardScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = VecShard.Schema
  private var pushed: Array[Filter] = Array.empty
  private var aggTags: Option[Seq[VecShard.AggTag]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(VecShard.supported)
    // conservative: every filter stays residual (Spark re-applies) — the
    // pushdown is a pruning accelerator, never the correctness bearer
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (`SupportsPushDownAggregates`, partial mode):
    * COUNT(*)/COUNT(vec_id)/MIN(vec_id)/MAX(vec_id) with no GROUP BY are
    * answered from the sidecar footers alone — one partial row per
    * shard, ZERO data-file opens (the parquet row-group-statistics
    * aggregate shortcut, on our own format). Spark plans the final
    * combine on top (count → sum of partials, min/max → min/max), so
    * correctness never rests on a single shard. Anything else — a
    * grouped aggregate, DISTINCT, an embedding aggregate, or any pushed
    * id filter (the footer cannot count a filtered subset) — declines,
    * and the scan falls back to the row path.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def isVecId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("vec_id"))
        case _ => false
      }
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return false
    val tags = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(VecShard.AggCount)
      case c: Count if !c.isDistinct && isVecId(c.column) => Some(VecShard.AggCount)
      case m: Min if isVecId(m.column) => Some(VecShard.AggMin)
      case m: Max if isVecId(m.column) => Some(VecShard.AggMax)
      case _ => None
    }
    if (tags.exists(_.isEmpty)) false
    else { aggTags = Some(tags.map(_.get)); true }
  }

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = aggTags match {
    case Some(tags) => new VecShardAggScan(path, tags)
    case None => new VecShardScan(path, required, pushed)
  }
}

private[sources] class VecShardScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"VecShardScan path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = VecShard.idBounds(pushed)
    VecShard.listShards(path)
      .filter(m => m.maxId >= lo && m.minId <= hi) // sidecar min/max shard pruning
      .map(m => VecShardPartition(m.file, m.count, m.dim, lo, hi): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new VecShardReaderFactory(required)
}

private[sources] final case class VecShardPartition(file: String, count: Int,
    dim: Int, lo: Long, hi: Long) extends InputPartition

/** The pushed-aggregate scan: one input partition PER SHARD carrying the
  * sidecar statistics, a reader that never opens a data file. Planning
  * reads only the `.meta` footers; the emitted rows are the PARTIAL
  * aggregates Spark's final combine folds — so a directory of a million
  * shards answers COUNT/MIN/MAX from a million sidecar lines, in
  * parallel, touching zero vector bytes.
  */
private[sources] class VecShardAggScan(path: String, tags: Seq[VecShard.AggTag])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(tags.zipWithIndex.map {
    case (t, i) => StructField(s"agg_$i" + (t match {
      case VecShard.AggCount => "_count"
      case VecShard.AggMin => "_min"
      case VecShard.AggMax => "_max"
    }), LongType, nullable = false)
  })
  override def description(): String =
    s"VecShardAggScan path=$path, PushedAggregation: [${tags.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    VecShard.listShards(path)
      .map(m => VecShardAggPartition(m.count, m.minId, m.maxId): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VecShardAggReaderFactory(tags)
}

private[sources] final case class VecShardAggPartition(count: Int, minId: Long,
    maxId: Long) extends InputPartition

private[sources] class VecShardAggReaderFactory(tags: Seq[VecShard.AggTag])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VecShardAggPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(tags.map {
        case VecShard.AggCount => p.count.toLong
        case VecShard.AggMin => p.minId
        case VecShard.AggMax => p.maxId
      }.toArray[Any])
      override def close(): Unit = ()
    }
  }
}

/** The DSv2 write path: tasks stream records to invisible `.tmp` files
  * and report (file, count, dim, min, max) upward; the driver-side
  * `commit` publishes atomically by renaming data files FIRST and writing
  * the sidecars LAST (a shard without its sidecar is invisible to
  * `listShards`, so a crash mid-publish leaves the table readable at its
  * prior state — the Sinks swap-writer discipline). `overwrite` maps to
  * the TRUNCATE capability: old shards are removed inside the same
  * commit, after the new data files land.
  */
private[sources] class VecShardWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new VecShardBatchWrite(path, schema, doTruncate)
    }
}

private[sources] final case class VecShardCommit(file: String, count: Int,
    dim: Int, minId: Long, maxId: Long)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class VecShardBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends org.apache.spark.sql.connector.write.BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new VecShardWriterFactory(path, schema)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val commits = messages.collect { case c: VecShardCommit if c.count > 0 => c }
    // publish: data files first (still sidecar-less ⇒ invisible) ...
    val published = commits.map { c =>
      val tmp = new File(c.file)
      val fin = new File(dir, tmp.getName.stripSuffix(".tmp"))
      require(tmp.renameTo(fin), s"publish failed for ${tmp.getName}")
      (c, fin)
    }
    // ... truncate-on-overwrite inside the commit, THEN the sidecars
    if (truncate) {
      val fresh = published.map(_._2.getName).toSet
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => (f.getName.endsWith(".vec") && !fresh(f.getName)) ||
          (f.getName.endsWith(".vec.meta") && !fresh(f.getName.stripSuffix(".meta"))))
        .foreach(f => f.delete(): Unit)
    }
    published.foreach { case (c, fin) =>
      val meta = new java.io.PrintWriter(new File(dir, fin.getName + ".meta"))
      try meta.println(s"${c.count} ${c.dim} ${c.minId} ${c.maxId}")
      finally meta.close()
    }
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.collect { case c: VecShardCommit => new File(c.file).delete() }: Unit
}

private[sources] class VecShardWriterFactory(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new VecShardDataWriter(path, schema, partitionId, taskId)
}

private[sources] class VecShardDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val idPos = schema.fieldIndex("vec_id")
  private val vecPos = schema.fieldIndex("embedding")
  private val file = {
    new File(path).mkdirs()
    new File(path, f"shard-$partitionId%05d-$taskId.vec.tmp")
  }
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(new FileOutputStream(file)))
  private var count = 0
  private var dim = -1
  private var minId = Long.MaxValue
  private var maxId = Long.MinValue
  private var buf: ByteBuffer = _

  override def write(row: InternalRow): Unit = {
    val id = row.getLong(idPos)
    val vec = row.getArray(vecPos)
    if (dim < 0) {
      dim = vec.numElements()
      buf = ByteBuffer.allocate(8 + 4 * dim).order(ByteOrder.LITTLE_ENDIAN)
    }
    require(vec.numElements() == dim, "ragged embedding widths in one shard")
    buf.clear(); buf.putLong(id)
    var i = 0
    while (i < dim) { buf.putFloat(vec.getFloat(i)); i += 1 }
    out.write(buf.array(), 0, buf.position())
    count += 1
    minId = math.min(minId, id); maxId = math.max(maxId, id)
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    if (count == 0) { file.delete(): Unit; VecShardCommit("", 0, 0, 0L, 0L) }
    else VecShardCommit(file.getAbsolutePath, count, dim, minId, maxId)
  }
  override def abort(): Unit = { out.close(); file.delete(): Unit }
  override def close(): Unit = ()
}

private[sources] class VecShardReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VecShardPartition]
    new VecShardReader(p, required)
  }
}

/** Streams one shard: fixed-stride records, id first. When the pruned
  * schema drops `embedding`, the vector bytes are SKIPPED, not decoded;
  * when the pushed id range excludes a record, the decode short-circuits
  * after the 8-byte id. Reader-local buffers — no per-row allocation
  * beyond the emitted row itself.
  */
private[sources] class VecShardReader(p: VecShardPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val wantVec = required.fieldNames.contains("embedding")
  private val wantId = required.fieldNames.contains("vec_id")
  private val in = new DataInputStream(
    new java.io.BufferedInputStream(new FileInputStream(p.file)))
  VecShard.filesOpened.incrementAndGet(): Unit
  private val idBuf = new Array[Byte](8)
  private val vecBytes = new Array[Byte](4 * p.dim)
  private var remaining = p.count
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (remaining > 0) {
      remaining -= 1
      in.readFully(idBuf)
      val id = ByteBuffer.wrap(idBuf).order(ByteOrder.LITTLE_ENDIAN).getLong
      if (id < p.lo || id > p.hi) {
        // outside the pushed range: skip the vector payload unread
        in.skipBytes(4 * p.dim): Unit
      } else {
        val values = required.fieldNames.map {
          case "vec_id" => java.lang.Long.valueOf(id)
          case "embedding" =>
            in.readFully(vecBytes)
            VecShard.vectorBytesDecoded.addAndGet(vecBytes.length.toLong): Unit
            val bb = ByteBuffer.wrap(vecBytes).order(ByteOrder.LITTLE_ENDIAN)
            val arr = new Array[Float](p.dim)
            var i = 0
            while (i < p.dim) { arr(i) = bb.getFloat; i += 1 }
            new GenericArrayData(arr)
        }
        if (!wantVec) in.skipBytes(4 * p.dim): Unit
        val _ = wantId // projection handled via required.fieldNames above
        current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
