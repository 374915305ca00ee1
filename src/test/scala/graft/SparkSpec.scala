package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs — `getOrCreate` reuses one session
  * across all suites in the forked test JVM (never stopped; the JVM exit
  * tears it down). `local[4]` with 4 shuffle partitions is plenty at the
  * sf0.001 fixtures all specs use.
  */
trait SparkSpec extends AnyFunSuite {

  // Route every embedded-Derby artifact (derby.log, the metastore_db and
  // in-memory-DB bookkeeping the JDBC specs touch) into a temp dir —
  // otherwise Derby drops them in the process CWD, i.e. the repo root.
  SparkSpec.derbyHome

  /** Smallest driver-generated scale factor — specs verify semantics, not
    * throughput.
    */
  val Sf: String = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    .appName("graft-spec")
    .getOrCreate()
}

object SparkSpec {
  /** Set once per JVM, before any suite loads the Derby driver. */
  lazy val derbyHome: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", dir)
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    dir
  }
}
