package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Z-order clustering: key arithmetic sanity, layout-preserving
  * semantics, and the actual data-skipping effect measured on parquet
  * row-group footers — the property a 100 TB scan depends on.
  */
class ZOrderSpec extends SparkSpec {

  /** sf0.01 so the small-row-group writes below produce enough row
    * groups for a meaningful pruning comparison.
    */
  private val SfMid = "/root/testdata/sf0.01"

  test("interleaveBits matches hand-computed Morton codes") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L), (1999L, 99L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleaveBits(col("x"), col("y")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toMap2
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    for (((x, y), z) <- rows) assert(z === morton(x, y), s"($x,$y)")
  }

  private implicit class Tupled(rs: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] = rs.map(r => (r._1, r._2) -> r._3).toMap
  }

  /** Row groups in all parquet files under `dir` whose [min,max] stats
    * for `column` (INT64) overlap [lo, hi] — exactly the groups a
    * stats-pruning reader must fetch.
    */
  private def overlappingRowGroups(dir: String, column: String, lo: Long, hi: Long): (Int, Int) = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    var total = 0
    var overlap = 0
    files.foreach { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        rdr.getFooter.getBlocks.asScala.foreach { b =>
          total += 1
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get.getStatistics
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
          if (mx >= lo && mn <= hi) overlap += 1
        }
      } finally rdr.close()
    }
    (total, overlap)
  }

  test("z-ordered layout prunes second-dimension row groups a linear sort cannot") {
    val li = spark.read.parquet(s"$SfMid/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = s"$base/linear"
    val zDir = s"$base/zorder"
    val smallGroups = 128L * 1024

    // linear: the best single-column sort can do — leading column rules
    li.repartition(1).sortWithinPartitions(col("l_partkey"), col("l_suppkey"))
      .write.mode("overwrite")
      .option("parquet.block.size", smallGroups.toString).parquet(linDir)
    ZOrder.zorderWrite(li, "l_partkey", "l_suppkey", zDir,
      numFiles = 1, rowGroupBytes = smallGroups)

    // identical data under both layouts
    val a = spark.read.parquet(linDir)
    val b = spark.read.parquet(zDir)
    assert(a.count() === b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // the second-dimension predicate: suppkey band, no partkey filter
    val (linTotal, linOverlap) = overlappingRowGroups(linDir, "l_suppkey", 20L, 29L)
    val (zTotal, zOverlap) = overlappingRowGroups(zDir, "l_suppkey", 20L, 29L)
    assert(linTotal >= 8, s"need enough row groups for a meaningful test, got $linTotal")
    // linear sort by partkey scatters suppkey: every group spans ~the full range
    assert(linOverlap === linTotal,
      s"expected the linear layout to prune nothing, pruned ${linTotal - linOverlap}")
    // the z layout must actually skip groups for the same predicate
    assert(zOverlap < zTotal, s"z layout pruned nothing ($zOverlap of $zTotal)")
    assert(zOverlap.toDouble / zTotal < 0.8,
      s"z layout should skip >20% of groups, read $zOverlap of $zTotal")
  }
}
