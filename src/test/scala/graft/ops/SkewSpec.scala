package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The skew-join triangle on a deliberately skewed corpus (half of all
  * fact rows on one key): AQE's adaptive split must actually engage
  * (plan-gated, not assumed), and all three spellings — straggler plain
  * join, explicit salting, AQE skew-join — must agree on the result.
  * Walls are reported for BASELINE.md's record.
  */
class SkewSpec extends SparkSpec {

  private val NRows = 2000000L
  private val NKeys = 50000L

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // force a shuffle join (no broadcast) so the skewed partition exists
  private val NoBroadcast = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  // thresholds sized to this corpus so AQE recognizes the hot partition
  private val SkewTuned = NoBroadcast ++ Seq(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m")

  private def run(df: DataFrame): (Long, Double, String) = {
    // drive THIS queryExecution (count() would plan a separate query and
    // the AQE final plan would never materialize on df's own execution)
    val qe = df.queryExecution
    val t0 = System.nanoTime()
    val n = qe.toRdd.count()
    val secs = (System.nanoTime() - t0) / 1e9
    (n, secs, qe.executedPlan.toString)
  }

  test("AQE splits the skewed partition; plain, salted, and AQE joins agree") {
    val fact = Skew.skewedFact(spark, NRows, NKeys)
    val dim = Skew.skewedDim(spark, NKeys)

    val (nPlain, tPlain, planPlain) = withConfs(
      (NoBroadcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false")): _*) {
      run(Skew.plainJoin(fact, dim))
    }
    assert(!planPlain.contains("skew=true"), "baseline must not skew-split")

    val (nAqe, tAqe, planAqe) = withConfs(SkewTuned: _*) {
      run(Skew.plainJoin(fact, dim))
    }
    assert(planAqe.contains("skew=true"),
      s"AQE must mark the skewed join split:\n$planAqe")

    val (nSalted, tSalted, _) = withConfs(NoBroadcast: _*) {
      run(Skew.saltedJoin(fact, dim))
    }

    assert(nPlain == nAqe && nPlain == nSalted,
      s"all three spellings must agree: plain=$nPlain aqe=$nAqe salted=$nSalted")
    info(f"plain(straggler)=$tPlain%.2f s  aqe(skew-split)=$tAqe%.2f s  " +
      f"salted=$tSalted%.2f s  rows=$nPlain%,d")
  }

  test("salted join result is row-identical to the plain join on a skewed sample") {
    val fact = Skew.skewedFact(spark, 100000L, 1000L)
    val dim = Skew.skewedDim(spark, 1000L)
    val plain = Skew.plainJoin(fact, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).sorted
    val salted = Skew.saltedJoin(fact, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).sorted
    assert(plain.length == 100000)
    assert(plain.toSeq == salted.toSeq)
  }
}
