package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x205 Benford audit: per-digit counts, shares and chi² must equal a
  * driver-side recomputation with the identical embedded expectation
  * constants and pinned fold order.
  */
class BenfordSpec extends SparkSpec {

  test("x205 equals the driver-side Benford recomputation") {
    val cents = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_totalprice")).collect()
      .map(r => math.floor(r.getDouble(0) * 100.0).toLong)
      .filter(_ > 0L)
    val byDigit = cents.map(_.toString.head.asDigit)
      .groupBy(identity).map { case (d, g) => d -> g.length.toLong }
    val total = byDigit.values.sum
    val terms = byDigit.toSeq.sortBy(_._1).map { case (d, n) =>
      val e = DataQuality.benfordExp(d)
      val t = (n.toDouble - total.toDouble * e) *
        (n.toDouble - total.toDouble * e) / (total.toDouble * e)
      (d, n, t)
    }
    var chi2 = 0.0
    terms.foreach { case (_, _, t) => chi2 += t } // ascending-digit fold
    val got = DataQuality.benfordAudit(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(got.length === terms.length)
    got.zip(terms).foreach { case ((d, n, share, exp, term, c2), (td, tn, tt)) =>
      assert(d === td); assert(n === tn)
      assert(share === n.toDouble / total.toDouble)
      assert(exp === DataQuality.benfordExp(d))
      assert(term === tt)
      assert(c2 === chi2)
    }
    // shares and expectations both sum to ~1
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-9)
  }
}
