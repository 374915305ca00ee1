package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (the RunOne class of tool): stage-level wall times for
  * the scaled-k SemDeDup lane, to attribute its cold cost at a given
  * corpus. Not registered in SparkEntry; builder-side only.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val pts0 = Clustering.qvecs(spark, dir)
    t("qvecs.count")(pts0.count())
    val k = Clustering.scaledK(spark, dir)
    println(s"[probe] k = $k")
    val pts = pts0.repartition(spark.sparkContext.defaultParallelism)
    val seed = t("seed")(
      graft.engine.Pin.PinOps(Clustering.seedCentroidsOf(pts, k)).pinned)
    val a1 = Clustering.assignFast(pts, seed)
    t("assign pass 1 (count)")(a1.count())
    val a1b = Clustering.assignFast(pts, seed)
    t("assign pass 1 again")(a1b.count())
    spark.stop()
  }
}
