package graft.engine

/** O3: retries + alerting — the operational surface the reference gets
  * from Airflow (`retries: 1` and `on_failure_callback` in the DAG
  * default_args; reference `dags/flights_data_pipeline.py:49-55`),
  * re-expressed as a composable wrapper around any load/transform step.
  *
  * Deliberately driver-side and tiny: retrying a SPARK ACTION re-runs the
  * whole lineage (Spark already retries tasks/stages internally — this
  * layer is for job-level transients: a sink briefly unavailable, a
  * concurrent writer's rename race), and alerting is a callback so the
  * caller decides the channel (log line, metrics counter, pager) — the
  * library does not pick a transport, exactly like the reference
  * delegates to Airflow's notifier.
  */
object Reliability {

  /** One attempt's outcome, reported to the `onEvent` hook. */
  final case class Attempt(task: String, attempt: Int, durationMs: Long,
      error: Option[String])

  /** Run `body` with up to `maxAttempts` attempts and exponential backoff
    * (baseDelayMs, 2x per retry). Every attempt is reported to `onEvent`;
    * `onAlert` fires once if ALL attempts fail (the on_failure_callback
    * analog), after which the last error is rethrown — a failed load must
    * fail the run, not vanish into a log.
    */
  def withRetry[T](task: String, maxAttempts: Int = 3, baseDelayMs: Long = 100,
      onEvent: Attempt => Unit = _ => (),
      onAlert: Attempt => Unit = _ => ())(body: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be at least 1")
    var attempt = 1
    while (true) {
      val t0 = System.nanoTime()
      try {
        val out = body
        onEvent(Attempt(task, attempt, (System.nanoTime() - t0) / 1000000, None))
        return out
      } catch {
        case scala.util.control.NonFatal(e) =>
          val rec = Attempt(task, attempt, (System.nanoTime() - t0) / 1000000,
            Some(e.toString))
          onEvent(rec)
          if (attempt >= maxAttempts) {
            onAlert(rec)
            throw e
          }
          Thread.sleep(baseDelayMs << (attempt - 1))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
