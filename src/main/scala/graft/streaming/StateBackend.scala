package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming family
  * (windowed aggregations, stream-stream joins, sessionization,
  * flatMapGroupsWithState).
  *
  * Spark binds `spark.sql.streaming.stateStore.providerClass` PER QUERY
  * at start time and pins it in the checkpoint, so the choice is a
  * deployment decision, not a code change — which is exactly why the
  * transforms in [[EventStream]] take no backend parameter and this
  * object exists instead.
  *
  * When each backend is right:
  *   - `hdfs` (the default HDFSBackedStateStoreProvider): state lives in
  *     executor heap with snapshot/delta files behind it. Lowest latency
  *     while TOTAL state fits in memory — fine for the watermark-bounded
  *     window/join state here at test scale.
  *   - `rocksdb` (RocksDBStateStoreProvider, bundled with Spark 4):
  *     state lives off-heap/on-disk per partition. The 100 TB answer
  *     when state outgrows heap (wide dedup horizons, big session
  *     cardinality, stream-stream joins with long watermarks): bounded
  *     memory at any state size, changelog checkpointing, and no GC
  *     cliff. EventStreamSpec runs the stateful family under BOTH
  *     backends and reports per-operator state rows/bytes.
  */
object StateBackend {

  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Friendly name → provider class; a fully-qualified class passes
    * through, so custom providers keep working.
    */
  def providerOf(name: String): String = name.toLowerCase match {
    case "hdfs" | "default" => Hdfs
    case "rocksdb" => RocksDB
    case other if other.contains(".") => name
    case other =>
      throw new IllegalArgumentException(
        s"unknown state backend '$other' (expected hdfs, rocksdb, or a provider class)")
  }

  /** Set the session's state backend; returns the PREVIOUS provider so
    * callers can restore it. Affects queries started after this call —
    * running queries keep the provider their checkpoint pinned.
    */
  def set(spark: SparkSession, name: String): String = {
    val prev = spark.conf.getOption(ProviderConf).getOrElse(Hdfs)
    spark.conf.set(ProviderConf, providerOf(name))
    prev
  }

  /** Run `f` with the given backend, restoring the previous provider
    * afterwards — the spec-friendly scoped form.
    */
  def withBackend[T](spark: SparkSession, name: String)(f: => T): T = {
    val prev = set(spark, name)
    try f finally spark.conf.set(ProviderConf, prev)
  }
}
