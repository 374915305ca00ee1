package graft.flights

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Incremental, Sinks, Sources}

/** The orchestration layer (SURVEY.md §2.10 O1-O5): the reference's
  * per-day DAG run — extract each staging table for the logical date,
  * load idempotently, then rebuild the star schema — as one driver call.
  *
  *   - O1: per-table extract->load in the FK-safe order declared in the
  *     reference (`start.sh:20-23`; irrelevant for parquet, kept for
  *     determinism and parity);
  *   - O2: transforms strictly dims-then-facts
  *     (`dags/flights_data_pipeline.py:229-251`);
  *   - O4: a table with an empty increment is skipped, and its previously
  *     loaded days remain untouched;
  *   - O5: `PipelineConfig` replaces the Airflow Variables surface
  *     (`incremental`, table list, CSV edge toggle).
  *
  * Scale: each daily run only touches that day's partitions (S6), so a
  * backfill (`catchup=True`, `:63-66`) is a loop of independent `runFor`
  * calls — at 100 TB those are embarrassingly parallel across days.
  */
final case class PipelineConfig(
    tables: Seq[String] = Pipeline.FkOrder,
    incremental: Boolean = true,
    tsCol: String = "updated_at",
    /** route extract->load through the CSV edge (S3/S5), as the
      * reference does via MinIO, instead of handing DataFrames across
      * directly.
      */
    csvEdge: Boolean = false,
    /** O3: per-table load attempts (the reference's `retries: 1` means
      * 2 attempts total) and the on_failure_callback analog, fired once
      * when a table exhausts its attempts.
      */
    loadAttempts: Int = 2,
    onFailure: graft.engine.Reliability.Attempt => Unit = _ => ())

object Pipeline {

  /** FK-safe load order (reference `start.sh:20-23`). */
  val FkOrder: Seq[String] = Seq(
    "aircrafts_data", "airports_data", "bookings", "tickets",
    "seats", "flights", "ticket_flights", "boarding_passes")

  private def stgPath(warehouseDir: String, table: String) = s"$warehouseDir/stg/$table"

  /** One logical-date run: extract+load every staging table for `ds`,
    * then rebuild all 8 dims/facts from the accumulated staging layer.
    * Returns per-table load results keyed by table name.
    */
  def runFor(spark: SparkSession, source: Map[String, DataFrame],
      warehouseDir: String, ds: String,
      cfg: PipelineConfig = PipelineConfig()): Map[String, Incremental.LoadStatus] = {
    val results = loadFor(spark, source, warehouseDir, ds, cfg, dayScopedWrites = false)
    transform(spark, warehouseDir)
    results
  }

  /** The extract+load half of one logical-date run (no transform).
    * `dayScopedWrites = true` switches the S6 sink to the
    * single-day-partition-directory form and day-scopes the CSV edge
    * paths — the variant whose (table, day) write jobs have disjoint
    * staging dirs and are therefore safe to run concurrently across
    * days (see `backfillParallel`).
    */
  private def loadFor(spark: SparkSession, source: Map[String, DataFrame],
      warehouseDir: String, ds: String, cfg: PipelineConfig,
      dayScopedWrites: Boolean): Map[String, Incremental.LoadStatus] =
    cfg.tables.map { table =>
      val extracted =
        if (cfg.incremental) Incremental.dayWindow(source(table), cfg.tsCol, ds)
        else source(table)
      // persisted so the emptiness check, the write, and the returned
      // row count all see one snapshot of the extract
      val pinned = extracted.persist()
      val status =
        try {
          val rows = pinned.count()
          if (rows == 0) Incremental.SkippedEmpty
          else graft.engine.Reliability.withRetry(
            s"load:$table", maxAttempts = cfg.loadAttempts, baseDelayMs = 50,
            onAlert = cfg.onFailure) {
            // retry-safe by construction: the idempotent day-partition
            // overwrite (S6) / truncate-load (S7) make a second attempt
            // land on clean state, never a double append
            val loaded =
              if (cfg.csvEdge) {
                // the reference's MinIO hop: extract writes CSV, load
                // re-reads it under the declared schema (S3 -> S5)
                val edge =
                  if (dayScopedWrites) s"$warehouseDir/edge/$ds/$table"
                  else s"$warehouseDir/edge/$table"
                Sources.writeCsv(pinned, edge)
                Sources.readCsv(spark, pinned.schema, edge)
              } else pinned
            if (cfg.incremental && dayScopedWrites)
              Sinks.overwriteSingleDayPartition(loaded, cfg.tsCol, ds,
                stgPath(warehouseDir, table))
            else if (cfg.incremental)
              Sinks.overwriteDayPartitions(loaded, cfg.tsCol, stgPath(warehouseDir, table))
            else
              Sinks.truncateLoad(loaded, stgPath(warehouseDir, table))
            Incremental.Loaded(if (cfg.csvEdge) loaded.count() else rows)
          }
        } finally pinned.unpersist()
      table -> status
    }.toMap

  /** Rebuild the 8 warehouse tables (dims before facts) from whatever the
    * staging layer currently holds. Tables whose staging input has never
    * loaded are skipped — the downstream targets simply don't appear yet
    * (the reference would have failed its transform task; we treat the
    * run as partial).
    */
  def transform(spark: SparkSession, warehouseDir: String): Unit = {
    val fs = new Path(warehouseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stg: Map[String, DataFrame] = FkOrder.flatMap { t =>
      val p = stgPath(warehouseDir, t)
      if (fs.exists(new Path(p))) Some(t -> spark.read.parquet(p)) else None
    }.toMap
    if (FkOrder.forall(stg.contains)) {
      StarSchema.transforms.foreach { case (name, fn) =>
        Sinks.truncateLoad(fn(stg), s"$warehouseDir/$name")
      }
    }
  }

  /** The star rebuild as ONE atomic version set: all 8 dims/facts
    * commit to per-table [[graft.engine.SnapshotSet]] roots, then one
    * manifest commit publishes them together — a crash mid-rebuild
    * leaves readers on the previous CONSISTENT set (the reference's
    * sequential transform chain, and `transform` above, both expose a
    * half-updated warehouse in that window). Readers go through
    * `SnapshotSet.readTable(spark, s"$warehouseDir/star", name)`.
    * Returns the published set version, or None when staging is
    * incomplete (the same partial-run skip as `transform`).
    */
  def transformAtomic(spark: SparkSession, warehouseDir: String): Option[Long] = {
    val fs = new Path(warehouseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stg: Map[String, DataFrame] = FkOrder.flatMap { t =>
      val p = stgPath(warehouseDir, t)
      if (fs.exists(new Path(p))) Some(t -> spark.read.parquet(p)) else None
    }.toMap
    if (!FkOrder.forall(stg.contains)) None
    else Some(graft.engine.SnapshotSet.publish(spark, s"$warehouseDir/star",
      StarSchema.transforms.map { case (name, fn) => name -> fn(stg) }.toMap))
  }

  /** The reference's `catchup=True` backfill: ordered daily runs
    * (`max_active_runs=1`).
    */
  def backfill(spark: SparkSession, source: Map[String, DataFrame],
      warehouseDir: String, days: Seq[String],
      cfg: PipelineConfig = PipelineConfig()): Map[String, Map[String, Incremental.LoadStatus]] =
    days.map(ds => ds -> runFor(spark, source, warehouseDir, ds, cfg)).toMap

  /** Backfill with the days loaded CONCURRENTLY (bounded by
    * `parallelism` driver threads — Spark schedules jobs from multiple
    * threads fine), then ONE star-schema rebuild at the end instead of
    * one per day. Safe because each (table, day) write job targets its
    * own partition directory (disjoint data AND disjoint committer
    * staging — see `Sinks.overwriteSingleDayPartition`); the transform
    * is kept out of the parallel section because the 8 star tables are
    * shared across days. At 100 TB this is the backfill you actually
    * run: a month of history is 30 independent day loads and one
    * rebuild, not 30 sequential DAG runs (the reference's
    * `max_active_runs=1` loop). Requires `cfg.incremental` (a
    * truncate-load backfill is inherently last-writer-wins and gains
    * nothing from running days concurrently).
    */
  def backfillParallel(spark: SparkSession, source: Map[String, DataFrame],
      warehouseDir: String, days: Seq[String],
      cfg: PipelineConfig = PipelineConfig(),
      parallelism: Int = 4): Map[String, Map[String, Incremental.LoadStatus]] = {
    require(cfg.incremental, "parallel backfill needs day-partitioned (incremental) loads")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = days.map { ds =>
        ds -> scala.concurrent.Future(
          loadFor(spark, source, warehouseDir, ds, cfg, dayScopedWrites = true))
      }
      val results = futures.map { case (ds, f) =>
        ds -> scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
      }.toMap
      transform(spark, warehouseDir)
      results
    } finally pool.shutdown()
  }
}
