package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry: name -> parquet path under a scale-factor directory.
  *
  * The reference keeps its catalog implicit in Airflow Variables
  * (`tables_to_extract`, reference `start.sh:20-23`) and Postgres schemas;
  * here the catalog is an explicit registry so sources stay declarative and
  * Catalyst sees a plain parquet relation (filter/column pushdown for free).
  */
object Tables {
  /** Driver-generated tables (see /root/repo/TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Scan a registered table. Schema comes from the parquet footer —
    * deterministic (driver-written), so no inference ambiguity to pin.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))
}
