package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Apply `log` (payload columns of `base` + `seq` + `op` ∈ I/U/D) to
    * `base`. Ties on seq break by op descending (U > I > D would be
    * arbitrary — we pin lexicographic DESC so ties are deterministic;
    * real feeds have unique sequence numbers).
    */
  def applyCdc(base: DataFrame, log: DataFrame, key: String): DataFrame = {
    val payload = base.columns.toSeq
    val latest = log
      .withColumn("rk", row_number().over(Window.partitionBy(col(key))
        .orderBy(col("seq").desc, col("op").desc)))
      .filter(col("rk") === 1).drop("rk")
    val untouched = base.join(latest.select(col(key)), Seq(key), "left_anti")
    untouched.unionByName(
      latest.filter(col("op") =!= "D")
        .select(payload.map(col): _*))
  }

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
    val log = inserts.unionByName(stale).unionByName(updates)
      .unionByName(deletes)
    applyCdc(base, log, "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x207_cdc_apply" -> ((s: SparkSession, dir: String) => cdcApply(s, dir)))

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
        |ORDER BY o_orderkey""".stripMargin)
}
