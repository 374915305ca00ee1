package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** x196/x197 governance lane: both audits must equal a driver-side
  * recomputation from the raw dimension, and the lattice must be
  * internally consistent (group sizes non-decreasing up the lattice,
  * safe_level = first level reaching k).
  */
class PrivacySpec extends SparkSpec {

  private def cents(b: Double): Long = math.floor(b * 100.0).toLong

  test("x196 groups, counts and verdicts match the driver reference") {
    val rows = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getInt(1), r.getString(2),
        math.floor(cents(r.getDouble(3)) / 100000.0).toLong))
    val truth = rows.groupBy(r => (r._1, r._3)).map { case ((nat, b), g) =>
      (nat, b) -> ((g.length.toLong, g.map(_._2).distinct.length.toLong))
    }
    val got = Privacy.kAnonymityAudit(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(got.length === truth.size)
    got.foreach { case (nat, b, n, d, ka, ld) =>
      val (tn, td) = truth((nat, b))
      assert(n === tn); assert(d === td)
      assert(ka === (n >= 5)); assert(ld === (d >= 3))
    }
    assert(got.exists(!_._5), "audit should find at-risk groups")
  }

  test("x197 lattice is monotone and safe_level is the first k-reaching level") {
    val got = Privacy.generalizationLevels(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.length === spark.read.parquet(s"$Sf/customer.parquet").count())
    got.foreach { case (_, n0, n1, n2, lvl) =>
      assert(n0 <= n1, "coarsening the band cannot shrink the group")
      // L1 -> L2 changes the key family (nation -> region) AND coarsens
      // the band; the region group contains the nation group
      assert(n1 <= n2)
      val expect = if (n0 >= 5) 0 else if (n1 >= 5) 1 else if (n2 >= 5) 2 else 99
      assert(lvl === expect)
    }
    assert(got.exists(_._5 > 0), "some rows need generalizing on this fixture")
  }

  test("x200 masked extract is consistent with the x197 lattice and leaks nothing") {
    def h15(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val levels = Privacy.generalizationLevels(spark, Sf).collect()
      .map(r => h15(s"pseud:${r.getLong(0)}") -> r.getInt(4)).toMap
    val rows = Privacy.maskedExtract(spark, Sf).collect()
    assert(rows.length === levels.size)
    // pseudonyms are unique (a joinable tokenization, not a hash bucket)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val (p, lvl, geo) = (r.getLong(0), r.getInt(1), r.getString(2))
      assert(lvl === levels(p), s"level of $p must match x197")
      if (lvl <= 1) assert(geo.startsWith("NATION:"))
      else if (lvl == 2) assert(geo.startsWith("REGION:"))
      else { assert(geo === "SUPPRESSED"); assert(r.isNullAt(3) && r.isNullAt(4)) }
      if (lvl <= 2) {
        assert(!r.isNullAt(3) && !r.isNullAt(4))
        assert(r.getLong(4) === Seq(1000L, 5000L, 25000L)(lvl))
      }
    }
    // nothing key- or name-shaped survives in the schema
    val cols = Privacy.maskedExtract(spark, Sf).columns.toSet
    assert(!cols.exists(c => c.contains("custkey") || c.contains("name")))
  }
}
