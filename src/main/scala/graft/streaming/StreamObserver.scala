package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a `StreamingQueryListener` that records one
  * row per completed micro-batch (query, batch id, input rows, batch
  * duration) and fires an alert hook when a batch exceeds a duration
  * budget — the lag/backlog signal an operator pages on. The streaming
  * counterpart of `engine.Reliability`: the library records and alerts;
  * the transport stays caller-chosen.
  *
  * Progress rows are tiny (one per trigger) and buffered on the driver —
  * bounded by `maxRows` (oldest dropped), so a long-running query cannot
  * grow the driver heap.
  */
final class StreamObserver(spark: SparkSession, maxRows: Int = 10000,
    slowBatchMs: Long = Long.MaxValue,
    onSlowBatch: StreamObserver.BatchProgress => Unit = _ => ())
    extends StreamingQueryListener {

  private val buf = ArrayBuffer.empty[StreamObserver.BatchProgress]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val rec = StreamObserver.BatchProgress(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows, p.batchDuration)
    buf.synchronized {
      buf += rec
      if (buf.size > maxRows) buf.remove(0, buf.size - maxRows)
    }
    if (rec.batch_duration_ms > slowBatchMs) onSlowBatch(rec)
  }

  /** The recorded progress as a queryable DataFrame. */
  def progress(): DataFrame = {
    import spark.implicits._
    buf.synchronized { buf.toSeq }.toDF()
  }

  def attach(): this.type = { spark.streams.addListener(this); this }
  def detach(): Unit = spark.streams.removeListener(this)
}

object StreamObserver {
  final case class BatchProgress(query: String, batch_id: Long,
      input_rows: Long, batch_duration_ms: Long)
}
