package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Pin.PinOps

/** Change-data-capture application — the lakehouse MERGE: fold a log of
  * full-row I/U/D events into a base snapshot, latest event per key
  * winning by (sequence, op) order. The batch sibling of the streaming
  * upsert (`Sinks.upsert` handles keyed overwrite; CDC adds deletes and
  * a total per-key ordering, which is what a Debezium/binlog feed
  * actually delivers).
  *
  * Semantics: keys untouched by the log keep their base row; a key's
  * LATEST log event replaces it (I and U both carry the full row); a
  * latest-D removes it. Events below the per-key maximum are skipped
  * entirely — CDC apply is order-insensitive within a batch because
  * only the argmax wins (the same reason replayed logs are idempotent:
  * re-applying a prefix cannot change the argmax).
  *
  * Scale shape: one per-key argmax over the log (map-side combinable
  * max-of-struct — the log shuffles once on key), one left-anti join
  * of the base against the touched keys, one union. The base table
  * never shuffles if bucketed on the key.
  */
object Cdc {

  /** The per-key argmax of a CDC log — one row per key, the event with
    * the greatest (seq, op). Deliberately an AGGREGATE (`max_by` over a
    * (seq, op) ordering struct), not a `row_number` window: a window
    * partition must be fully co-located, so a hot key carrying half the
    * log (one entity rewritten in a tight loop — the classic CDC skew)
    * becomes one straggler task no AQE can split. The aggregate gets
    * map-side PARTIAL aggregation instead: every input partition
    * reduces the hot key to a single candidate before the shuffle, so
    * the skew never crosses the wire (CdcSkewSpec pins both the plan
    * shape and value-equality with the window form).
    */
  private def latestPerKey(log: DataFrame, key: String): DataFrame = {
    val others = log.columns.toSeq.filterNot(_ == key)
    log.groupBy(col(key))
      .agg(max_by(struct(others.map(col): _*),
        struct(col("seq"), col("op"))).as("_w"))
      .select(col(key) +: others.map(c => col("_w").getField(c).as(c)): _*)
  }

  /** Apply `log` (payload columns of `base` + `seq` + `op` ∈ I/U/D) to
    * `base`. Ties on seq break by op descending (U > I > D would be
    * arbitrary — we pin lexicographic DESC so ties are deterministic;
    * real feeds have unique sequence numbers).
    */
  def applyCdc(base: DataFrame, log: DataFrame, key: String): DataFrame = {
    val payload = base.columns.toSeq
    val latest = latestPerKey(log, key)
    val untouched = base.join(latest.select(col(key)), Seq(key), "left_anti")
    untouched.unionByName(
      latest.filter(col("op") =!= "D")
        .select(payload.map(col): _*))
  }

  // -------------------------------------------------------------------
  // Stateful apply: correct under ANY batch decomposition of the log
  // -------------------------------------------------------------------

  /** Lift a plain snapshot into CDC state: per-key applied provenance
    * `_seq`/`_op` (below any real sequence) and `_tombstone = false`.
    * Plain [[applyCdc]] is only safe when each batch carries a key's
    * FULL history-so-far; once batches are folded (compaction), a late
    * event older than the applied one has nothing to lose against —
    * it would wrongly win, and a stale insert could resurrect a
    * deleted key. State keeps exactly the two fields that decide both.
    */
  def initState(base: DataFrame): DataFrame =
    base.withColumn("_seq", lit(Long.MinValue))
      .withColumn("_op", lit(""))
      .withColumn("_tombstone", lit(false))

  /** Apply one log batch to CDC state. A log event wins only if its
    * (seq, op) is strictly above the applied (_seq, _op) — so replay,
    * duplicate delivery, out-of-order delivery across batches, and
    * equal-seq ties all resolve to the same result as a one-shot apply
    * of the whole log (CdcSpec folds random splits; x208 hash-gates
    * one). Deletes persist as tombstone rows: the key's seq watermark
    * must survive the delete or a late stale insert would resurrect it.
    *
    * Scale shape: per-batch argmax on the (small) batch, one full-outer
    * join against state on the key — state bucketed on the key never
    * re-shuffles, and tombstones compact away once the feed's lateness
    * horizon passes: [[expireTombstones]], paired with the horizon-gated
    * apply overload below (the retention knob real CDC systems expose;
    * wired into the self-compacting lane by
    * [[graft.streaming.CdcIngest.streamingCdcIngestCompactingStateful]]).
    */
  def applyCdcStateful(state: DataFrame, log: DataFrame, key: String): DataFrame = {
    val payload = state.columns.toSeq.filterNot(Set("_seq", "_op", "_tombstone"))
    val latest = latestPerKey(log, key)
    val lw = latest.select(struct(payload.map(col): _*).as("_lrow"),
      col(key).as("_lk"), col("seq").as("_lseq"), col("op").as("_lop"))
    val sw = state.select(struct(payload.map(col): _*).as("_srow"),
      col(key).as("_sk"), col("_seq"), col("_op"), col("_tombstone"))
    val takeLog = col("_lk").isNotNull && (col("_sk").isNull ||
      col("_lseq") > col("_seq") ||
      (col("_lseq") === col("_seq") && col("_lop") > col("_op")))
    sw.join(lw, col("_sk") === col("_lk"), "full_outer")
      .select(
        when(takeLog, col("_lrow")).otherwise(col("_srow")).as("_r"),
        when(takeLog, col("_lseq")).otherwise(col("_seq")).as("_seq"),
        when(takeLog, col("_lop")).otherwise(col("_op")).as("_op"),
        when(takeLog, col("_lop") === "D").otherwise(col("_tombstone"))
          .as("_tombstone"))
      .select((payload.map(p => col("_r").getField(p).as(p)) ++
        Seq(col("_seq"), col("_op"), col("_tombstone"))): _*)
  }

  /** The readable table behind CDC state. */
  def snapshot(state: DataFrame): DataFrame =
    state.filter(!col("_tombstone")).drop("_seq", "_op", "_tombstone")

  /** [[applyCdcStateful]] under the feed's lateness contract: events
    * with seq below `minSeqHorizon` are DISCARDED before the apply.
    * This is the gate that makes tombstone retention sound — a
    * tombstone's only job is to outrank late stale events for its key,
    * so once the feed promises nothing older than the horizon can still
    * arrive, (a) events below it must be dropped (they are contract
    * violations — replays of already-folded history at best, corruption
    * at worst) and (b) tombstones below it carry no information
    * ([[expireTombstones]]).
    */
  def applyCdcStateful(state: DataFrame, log: DataFrame, key: String,
      minSeqHorizon: Long): DataFrame =
    applyCdcStateful(state, log.filter(col("seq") >= lit(minSeqHorizon)), key)

  /** Tombstone retention — the knob real CDC systems expose: drop
    * tombstone rows whose applied `_seq` is below the feed's lateness
    * horizon. Without this, a long-running compacted CDC state grows by
    * every key ever deleted — the one unbounded term in its O(live keys)
    * footprint. Sound ONLY when every later apply is gated at the same
    * (or a later) horizon: the expired tombstone can no longer lose to
    * a stale insert because the gate discards that insert first
    * (CdcRetentionSpec pins resurrection-prevention, boundedness, and
    * fold==one-shot equivalence).
    */
  def expireTombstones(state: DataFrame, minSeqHorizon: Long): DataFrame =
    state.filter(!col("_tombstone") || col("_seq") >= lit(minSeqHorizon))

  /** x207: CDC apply over a deterministic log derived from `orders` —
    * base = keys ≡ 0 (mod 3); the log inserts the ≡ 1 keys (seq k·10+1),
    * updates every 5th base key with a 1.17-bumped price (seq k·10+2)
    * but first writes a STALE lower-seq insert for the same key (which
    * the argmax must skip), and deletes every 15th base key (seq k·10+9,
    * outranking that key's update). The oracle replays the identical
    * algebra relationally, so apply-order bugs, missed deletes, or
    * stale-event wins all hash-fail.
    */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val (base, log) = ordersBaseAndLog(s, dir)
    applyCdc(base, log, "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /** The x207 synthetic base + I/U/D log. */
  private def ordersBaseAndLog(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
    val base = orders.filter(pmod(col("o_orderkey"), lit(3L)) === 0L)
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(3L)) === 1L)
      .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
        (col("o_orderkey") * 10 + 1).as("seq"), lit("I").as("op"))
    val stale = base.filter(pmod(col("o_orderkey"), lit(5L)) === 0L)
      .select(col("o_orderkey"), lit("S").as("o_orderstatus"),
        lit(0L).as("cents"), (col("o_orderkey") * 10).as("seq"),
        lit("I").as("op"))
    val updates = base.filter(pmod(col("o_orderkey"), lit(5L)) === 0L)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("cents") + 117L).as("cents"),
        (col("o_orderkey") * 10 + 2).as("seq"), lit("U").as("op"))
    val deletes = base.filter(pmod(col("o_orderkey"), lit(15L)) === 0L)
      .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
        (col("o_orderkey") * 10 + 9).as("seq"), lit("D").as("op"))
    (base, inserts.unionByName(stale).unionByName(updates)
      .unionByName(deletes))
  }

  /** x208: the stateful apply under adversarial delivery — the x207
    * log PLUS an equal-seq tie (a delete sharing the update's seq,
    * losing to it by op-desc order) is split into three batches by
    * seq mod 3, which scatters each key's events across batches out
    * of chronological order (the %5 keys' stale insert at seq k·10
    * lands in a LATER batch than the update at k·10+2 whenever the
    * mods land that way — the exact post-compaction hazard). Folding
    * the batches through [[applyCdcStateful]] must reproduce the
    * one-shot whole-log argmax, which is what the DuckDB twin
    * computes; any seq-watermark regression, tie misresolution, or
    * tombstone resurrection hash-fails.
    */
  def cdcOutOfOrder(s: SparkSession, dir: String): DataFrame = {
    val (base, log0) = ordersBaseAndLog(s, dir)
    val tieDeletes = base.filter(pmod(col("o_orderkey"), lit(5L)) === 0L)
      .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
        (col("o_orderkey") * 10 + 2).as("seq"), lit("D").as("op"))
    val log = log0.unionByName(tieDeletes)
    val batches = (0 until 3).map(i =>
      log.filter(pmod(col("seq"), lit(3L)) === i.toLong))
    val fin = batches.foldLeft(initState(base)) {
      (st, b) => applyCdcStateful(st, b, "o_orderkey").pinned
    }
    snapshot(fin).orderBy(col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x207_cdc_apply" -> ((s: SparkSession, dir: String) => cdcApply(s, dir)),
    "x208_cdc_out_of_order" -> ((s: SparkSession, dir: String) => cdcOutOfOrder(s, dir)))

  val oracles: Map[String, String] = Map(
    // the same base/log derivation, per-key argmax by (seq, op) desc,
    // delete suppression and anti-join union
    "x207_cdc_apply" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |base AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
        |log AS (
        |  SELECT o_orderkey, o_orderstatus, cents,
        |    o_orderkey * 10 + 1 AS seq, 'I' AS op FROM o WHERE o_orderkey % 3 = 1
        |  UNION ALL
        |  SELECT o_orderkey, 'S', 0, o_orderkey * 10, 'I'
        |  FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, cents + 117,
        |    o_orderkey * 10 + 2, 'U' FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, cents, o_orderkey * 10 + 9, 'D'
        |  FROM base WHERE o_orderkey % 15 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC, op DESC) AS rk FROM log) WHERE rk = 1)
        |SELECT b.o_orderkey, b.o_orderstatus, b.cents FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM latest l
        |                  WHERE l.o_orderkey = b.o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, cents FROM latest WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    // x208: the one-shot whole-log argmax over the tie-extended log —
    // the truth ANY batch decomposition of the stateful fold must hit
    "x208_cdc_out_of_order" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |base AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
        |log AS (
        |  SELECT o_orderkey, o_orderstatus, cents,
        |    o_orderkey * 10 + 1 AS seq, 'I' AS op FROM o WHERE o_orderkey % 3 = 1
        |  UNION ALL
        |  SELECT o_orderkey, 'S', 0, o_orderkey * 10, 'I'
        |  FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, cents + 117,
        |    o_orderkey * 10 + 2, 'U' FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, cents, o_orderkey * 10 + 9, 'D'
        |  FROM base WHERE o_orderkey % 15 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, cents, o_orderkey * 10 + 2, 'D'
        |  FROM base WHERE o_orderkey % 5 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC, op DESC) AS rk FROM log) WHERE rk = 1)
        |SELECT b.o_orderkey, b.o_orderstatus, b.cents FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM latest l
        |                  WHERE l.o_orderkey = b.o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, cents FROM latest WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin)
}
