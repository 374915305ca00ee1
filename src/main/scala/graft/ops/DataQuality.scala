package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.engine.Pin.PinOps

/** Declarative data-quality checks — the dbt-test layer the reference's
  * warehouse would grow: primary-key uniqueness, referential integrity,
  * not-null, accepted values, and range checks, each expressed as a
  * violation-counting aggregate and unioned into one (check, table,
  * n_violations, passed) report.
  *
  * Scale shape: every check is a single scan-side aggregate (the FK
  * check an anti-join against the parent keys); checks over the same
  * table could share one pass, but independent checks parallelize as
  * independent jobs and each pushes only its own columns into the scan.
  */
object DataQuality {

  private def report(s: SparkSession, dir: String,
      rows: Seq[(String, String, DataFrame)]): DataFrame = {
    rows.map { case (name, table, violas) =>
      violas.agg(count(lit(1)).cast("long").as("n_violations"))
        .select(lit(name).as("check"), lit(table).as("table_name"),
          col("n_violations"), (col("n_violations") === 0L).as("passed"))
    }.reduce(_ unionByName _)
      .orderBy(col("check"))
  }

  /** The standard check suite over the TPC-H-ish tables. */
  def standardChecks(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val lineitem = Tables(s, dir, "lineitem")
    val customer = Tables(s, dir, "customer")
    report(s, dir, Seq(
      ("pk_unique_orders", "orders",
        orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)),
      ("fk_lineitem_orders", "lineitem",
        lineitem.join(orders.select(col("o_orderkey")),
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")),
      ("not_null_customer_name", "customer",
        customer.filter(col("c_name").isNull)),
      ("accepted_values_orderstatus", "orders",
        orders.filter(!col("o_orderstatus").isin("F", "O", "P"))),
      ("range_quantity", "lineitem",
        lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50))))
  }

  /** Distribution-drift monitor — the check a data pipeline runs when a
    * feed's COMPOSITION (not its schema) shifts: the source mix of the
    * first half of the corpus vs the second (deterministic arithmetic
    * midpoint of the doc_id range), per-source counts and shares, and
    * the total-variation distance over all sources. TVD is computed
    * from EXACT cross-multiplied integers — Σ|n_a·N_b − n_b·N_a| in
    * DECIMAL(38,0), one double division at the end — because a sum of
    * per-source double terms would be partition-order-dependent and
    * could not hash-gate (the x95 exact-sums discipline; PSI's log
    * terms are unhashable cross-engine for the same reason, and TVD is
    * the standard bounded [0,1] alternative).
    */
  def sourceDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    val bounds = docs.agg(((min(col("doc_id")) + max(col("doc_id")) + 1L) / 2L)
      .cast("long").as("mid"))
    val halved = docs.crossJoin(broadcast(bounds))
      .select(col("source"), (col("doc_id") < col("mid")).as("first_half"))
    val counts = halved.groupBy(col("source"))
      .agg(sum(when(col("first_half"), 1L).otherwise(0L)).cast("long").as("n_first"),
        sum(when(!col("first_half"), 1L).otherwise(0L)).cast("long").as("n_second"))
    val totals = counts.agg(sum(col("n_first")).cast("long").as("tot_first"),
      sum(col("n_second")).cast("long").as("tot_second"))
    val joined = counts.crossJoin(broadcast(totals))
      .withColumn("drift_num",
        abs(col("n_first").cast("decimal(38,0)") * col("tot_second").cast("decimal(38,0)")
          - col("n_second").cast("decimal(38,0)") * col("tot_first").cast("decimal(38,0)")))
    val tvd = joined
      .groupBy(col("tot_first"), col("tot_second")) // constants: one group
      .agg(sum(col("drift_num")).as("dn"))
      .select((col("dn").cast("double")
        / (lit(2.0) * col("tot_first").cast("double") * col("tot_second").cast("double")))
        .as("tvd_total"))
    joined.crossJoin(broadcast(tvd))
      .select(col("source"), col("n_first"), col("n_second"),
        (col("n_first").cast("double") / col("tot_first").cast("double")).as("share_first"),
        (col("n_second").cast("double") / col("tot_second").cast("double")).as("share_second"),
        col("tvd_total"))
      .orderBy(col("source"))
  }

  /** x183: CUSUM change detection over the daily event-count series,
    * per event type — the SEQUENTIAL drift detector next to the
    * distributional gates (x107/x108/x135 compare snapshots; CUSUM
    * accumulates small sustained shifts that no single snapshot
    * comparison sees): s_t = max(0, s_{t-1} + (x_t − mean − slack)),
    * alarm when s_t > h, with slack = mean/4 and h = mean (declared
    * parameters, rational in the day counts — no libm).
    *
    * Shape: one date-grain aggregate, then the per-type day series
    * folds as an ARRAY (a type's day count is bounded — ~weeks, not
    * corpus-sized); each day's s_t is the pinned sequential
    * `aggregate(slice(...))` left fold, the same `list_reduce` tree the
    * twin runs, with the clamp spelled `greatest(..., 0.0)` on both
    * engines.
    */
  def cusumDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val daily = Tables(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val series = daily.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("days"),
        sum(col("x")).as("total"), count(lit(1)).as("nd"))
      .withColumn("mean", col("total").cast("double") / col("nd").cast("double"))
      .withColumn("slack", col("mean") * lit(0.25))
    series
      .select(col("event_type"), col("mean"), col("slack"),
        posexplode(col("days")).as(Seq("pos", "d")), col("days"))
      .select(col("event_type"), col("d.day").as("day"), col("d.x").as("x"),
        aggregate(
          transform(slice(col("days"), lit(1), col("pos") + 1),
            e => e.getField("x").cast("double")),
          lit(0.0),
          (acc, v) => greatest(acc + v - col("mean") - col("slack"), lit(0.0)))
          .as("cusum"),
        col("mean"))
      .select(col("event_type"), col("day"), col("x"), col("cusum"),
        (col("cusum") > col("mean")).as("alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  /** x198: Holt's linear-trend smoothing (double exponential smoothing,
    * Holt 1957) over the per-type daily event-count series — the
    * FORECASTING complement to x183's change detection: CUSUM says "the
    * series shifted", Holt says "here is tomorrow's expected load".
    * α = β = 1/4 (declared rationals); init l₁ = y₁, b₁ = 0; update
    * l_t = (y_t + 3(l+b))/4, b_t = (l_t − l + 3b)/4. Per day:
    * the running (level, trend), the one-step-ahead fit l+b, its
    * residual, and the 7-day-ahead projection l + 7b.
    *
    * Shape: one date-grain aggregate, then per-type array folds with a
    * TWO-ELEMENT-ARRAY accumulator [level, trend] — the x183 pattern
    * with two state components; day counts are bounded (weeks, not
    * corpus-sized), so the per-day prefix folds stay tiny. The
    * identical `aggregate`/`list_reduce` expression tree runs on both
    * engines — same IEEE op order, so doubles hash-compare. (A struct
    * accumulator would be the natural spelling, but DuckDB 1.0's
    * list_reduce updates struct fields non-atomically — later fields
    * see earlier fields' NEW values — so the array form is the
    * cross-engine-safe one.)
    */
  def holtTrend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val daily = Tables(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val series = daily.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("days"))
    // state = [level, trend] as a 2-array (NOT a struct: DuckDB 1.0's
    // list_reduce updates struct accumulator fields non-atomically, so
    // the cross-engine-safe accumulator is an array on both sides)
    def state(upto: Column): Column = aggregate(
      transform(slice(col("days"), lit(2), upto),
        e => e.getField("x").cast("double")),
      array(element_at(col("days"), 1).getField("x").cast("double"), lit(0.0)),
      (acc, v) => array(
        (v + lit(3.0) * (element_at(acc, 1) + element_at(acc, 2))) / lit(4.0),
        ((v + lit(3.0) * (element_at(acc, 1) + element_at(acc, 2))) / lit(4.0)
          - element_at(acc, 1) + lit(3.0) * element_at(acc, 2)) / lit(4.0)))
    series
      .select(col("event_type"), posexplode(col("days")).as(Seq("pos", "d")),
        col("days"))
      .select(col("event_type"), col("d.day").as("day"),
        col("d.x").cast("double").as("x"),
        state(col("pos")).as("st"),       // state after day t = pos+1
        state(greatest(col("pos") - 1, lit(0))).as("prev")) // after day t-1
      .select(col("event_type"), col("day"), col("x"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        (element_at(col("prev"), 1) + element_at(col("prev"), 2)).as("fitted"),
        (col("x") - element_at(col("prev"), 1) - element_at(col("prev"), 2))
          .as("resid"),
        (element_at(col("st"), 1) + lit(7.0) * element_at(col("st"), 2))
          .as("forecast_7d"))
      .orderBy(col("event_type"), col("day"))
  }

  /** x203: Kaplan–Meier product-limit survival estimate (Kaplan &
    * Meier, JASA 1958) over user LIFETIMES in the event stream — the
    * churn curve: a user's duration is days from first to last event;
    * users still active in the final day are right-CENSORED at the
    * corpus end (their lifetime is only known to exceed what we saw —
    * dropping them would bias survival down, the mistake KM exists to
    * fix). Per distinct event day t: n_risk (lifetimes ≥ t), n_churn
    * (uncensored lifetimes = t), n_censored, and
    * S(t) = Π_{u ≤ t} (1 − d_u/n_u).
    *
    * Shape: two per-user aggregates (first/last ts), one per-duration
    * aggregate, then the at-risk suffix sums and the product-limit
    * fold run over the DAY-GRAIN frame — day-count-bounded (the
    * x183/x198 rule), never user- or event-sized. The product folds in
    * pinned ascending-day order, the identical expression tree on both
    * engines.
    */
  def kaplanMeier(s: SparkSession, dir: String,
      censorDays: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val horizon = ev.agg(max(col("us")).as("end_us"))
    val DayUs = 86400000000L
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(horizon))
      .select(
        floor((col("last_us") - col("first_us")).cast("double") / lit(DayUs.toDouble))
          .cast("long").as("dur"),
        (col("last_us") >= col("end_us") - lit(censorDays * DayUs)).as("censored"))
    val byDay = users.groupBy(col("dur"))
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("d"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
      // at-risk suffix sum: a global window, but over the DAY-GRAIN
      // frame only (≤ corpus-span rows — the q49/x175 bounded-window
      // precedent)
      .withColumn("n_risk", sum(col("d") + col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("dur"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
    val series = byDay.groupBy()
      .agg(array_sort(collect_list(struct(col("dur"), col("d"), col("c"),
        col("n_risk")))).as("days"))
    series
      .select(posexplode(col("days")).as(Seq("pos", "r")), col("days"))
      .select(col("r.dur").as("day"), col("r.d").as("n_churn"),
        col("r.c").as("n_censored"), col("r.n_risk").as("n_risk"),
        // product-limit over the prefix INCLUDING this day, pinned
        // ascending-day factor order
        aggregate(slice(col("days"), lit(1), col("pos") + 1), lit(1.0),
          (acc, e) => acc * (lit(1.0) -
            e.getField("d").cast("double") / e.getField("n_risk").cast("double")))
          .as("survival"))
      .orderBy(col("day"))
  }

  /** Benford's-law expected share of leading digit d: log10(1 + 1/d),
    * computed ONCE on the driver and embedded as the identical literal
    * in both engines (libm log10 is not guaranteed correctly rounded
    * cross-engine; a shared literal is).
    */
  private[ops] val benfordExp: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap

  /** x205: Benford first-digit audit over o_totalprice — the classic
    * fabricated-data screen (Benford 1938; Nigrini's forensic use):
    * per leading digit, observed count/share vs the log10(1+1/d)
    * expectation and the per-digit Pearson residual contribution
    * (obs − n·exp)²/(n·exp); the chi² total repeats on every row (the
    * x107 tvd_total convention). The leading digit comes from the
    * CENTS integer rendered as a string — integer formatting is
    * identical across engines, double formatting is not.
    *
    * Shape: one projection + one 9-group aggregate; the chi² total is
    * a 9-row second aggregate broadcast back.
    */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val digits = Tables(s, dir, "orders")
      .select(floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      .filter(col("cents") > 0L)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expCol = (1 to 9).foldLeft(lit(0.0)) { (acc, d) =>
      when(col("digit") === d, lit(benfordExp(d))).otherwise(acc)
    }
    val scored = digits.crossJoin(broadcast(
        digits.agg(sum(col("n")).as("total"))))
      .withColumn("expected", expCol)
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .withColumn("chi_term",
        (col("n").cast("double") - col("total").cast("double") * col("expected"))
          * (col("n").cast("double") - col("total").cast("double") * col("expected"))
          / (col("total").cast("double") * col("expected")))
      .pinned
    // chi² total: fold the 9 terms in pinned ascending-digit order
    // (a double SUM would be partition-order-dependent)
    val chi = scored.groupBy()
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("digit"), col("chi_term")))),
          e => e.getField("chi_term")),
        lit(0.0), (a, v) => a + v).as("chi2"))
    scored.crossJoin(broadcast(chi))
      .select(col("digit"), col("n"), col("share"), col("expected"),
        col("chi_term"), col("chi2"))
      .orderBy(col("digit"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x183_cusum_drift" -> ((s: SparkSession, dir: String) => cusumDrift(s, dir)),
    "x198_holt_trend" -> ((s: SparkSession, dir: String) => holtTrend(s, dir)),
    "x203_kaplan_meier" -> ((s: SparkSession, dir: String) => kaplanMeier(s, dir)),
    "x205_benford_audit" -> ((s: SparkSession, dir: String) => benfordAudit(s, dir)),
    "q42_data_quality" -> (standardChecks _),
    "x107_source_drift" -> (sourceDrift _))

  val oracles: Map[String, String] = Map(
    // x183: the same clamped sequential fold via list_reduce over the
    // day-ordered prefix — identical greatest(...) tree, same mean/slack
    // rationals.
    // x205: identical embedded expectation literals, same cents-string
    // digit rule, same pinned ascending-digit chi² fold.
    "x205_benford_audit" -> {
      // e-notation literals parse directly as DOUBLE in DuckDB (a
      // plain decimal literal routes through DECIMAL and can lose the
      // last ULP in the cast)
      val expCase = (1 to 9).map(d =>
        s"WHEN $d THEN ${benfordExp(d)}e0").mkString(" ")
      s"""WITH digits AS (
         |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
         |        FROM orders) o
         |  WHERE cents > 0 GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM digits),
         |scored AS (
         |  SELECT digit, n,
         |    CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
         |    CAST(CASE digit $expCase END AS DOUBLE) AS expected,
         |    (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * (CASE digit $expCase END))
         |      * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * (CASE digit $expCase END))
         |      / (CAST(total AS DOUBLE) * (CASE digit $expCase END)) AS chi_term
         |  FROM digits, tot),
         |chi AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list(chi_term ORDER BY digit)), (a, v) -> a + v) AS chi2
         |  FROM scored)
         |SELECT digit, n, share, expected, chi_term, chi.chi2
         |FROM scored, chi ORDER BY digit""".stripMargin
    },
    // x203: the same lifetimes, censoring rule, suffix-sum at-risk
    // counts and pinned ascending-day product fold.
    "x203_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |hz AS (SELECT max(us) AS end_us FROM ev),
        |users AS (
        |  SELECT CAST(floor((max(us) - min(us)) / 86400000000.0) AS BIGINT)
        |      AS dur,
        |    max(us) >= (SELECT end_us FROM hz) - 1 * 86400000000 AS censored
        |  FROM ev GROUP BY user_id),
        |byday AS (
        |  SELECT dur,
        |    CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM users GROUP BY dur),
        |risk AS (
        |  SELECT dur, d, c,
        |    CAST(sum(d + c) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS n_risk
        |  FROM byday),
        |series AS (
        |  SELECT list(struct_pack(dur := dur, d := d, c := c,
        |    n_risk := n_risk) ORDER BY dur) AS days FROM risk),
        |expanded AS (
        |  SELECT days, unnest(generate_series(1, len(days))) AS t FROM series)
        |SELECT days[t].dur AS day, days[t].d AS n_churn,
        |  days[t].c AS n_censored, days[t].n_risk AS n_risk,
        |  list_reduce(list_prepend(CAST(1 AS DOUBLE),
        |    list_transform(list_slice(days, 1, t), e ->
        |      CAST(e.d AS DOUBLE) / CAST(e.n_risk AS DOUBLE))),
        |    (acc, v) -> acc * (CAST(1 AS DOUBLE) - v)) AS survival
        |FROM expanded ORDER BY day""".stripMargin,
    // x198: the same struct-state Holt fold via list_reduce — identical
    // α=β=1/4 expression tree, same init (y₁, 0), same prefix slices.
    "x198_holt_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |series AS (
        |  SELECT event_type,
        |    list(struct_pack(day := day, x := x) ORDER BY day) AS days
        |  FROM daily GROUP BY event_type),
        |expanded AS (
        |  SELECT event_type, days,
        |    unnest(generate_series(1, len(days))) AS t
        |  FROM series),
        |st AS (
        |  SELECT event_type, days, t,
        |    list_reduce(list_prepend(
        |        [CAST(days[1].x AS DOUBLE), CAST(0 AS DOUBLE)],
        |        list_transform(list_slice(days, 2, t), e -> [CAST(e.x AS DOUBLE), CAST(0 AS DOUBLE)])),
        |      (acc, v) -> [(v[1] + 3.0 * (acc[1] + acc[2])) / 4.0,
        |                   ((v[1] + 3.0 * (acc[1] + acc[2])) / 4.0 - acc[1] + 3.0 * acc[2]) / 4.0])
        |      AS s,
        |    list_reduce(list_prepend(
        |        [CAST(days[1].x AS DOUBLE), CAST(0 AS DOUBLE)],
        |        list_transform(list_slice(days, 2, t - 1), e -> [CAST(e.x AS DOUBLE), CAST(0 AS DOUBLE)])),
        |      (acc, v) -> [(v[1] + 3.0 * (acc[1] + acc[2])) / 4.0,
        |                   ((v[1] + 3.0 * (acc[1] + acc[2])) / 4.0 - acc[1] + 3.0 * acc[2]) / 4.0])
        |      AS p
        |  FROM expanded)
        |SELECT event_type, days[t].day AS day, CAST(days[t].x AS DOUBLE) AS x,
        |  s[1] AS level, s[2] AS trend,
        |  p[1] + p[2] AS fitted,
        |  CAST(days[t].x AS DOUBLE) - p[1] - p[2] AS resid,
        |  s[1] + 7.0 * s[2] AS forecast_7d
        |FROM st ORDER BY event_type, day""".stripMargin,
    "x183_cusum_drift" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |series AS (
        |  SELECT event_type,
        |    list(struct_pack(day := day, x := x) ORDER BY day) AS days,
        |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
        |  FROM daily GROUP BY event_type),
        |expanded AS (
        |  SELECT event_type, mean, mean * 0.25 AS slack, days,
        |    unnest(generate_series(1, len(days))) AS pos
        |  FROM series)
        |SELECT event_type, days[pos].day AS day, days[pos].x AS x,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_slice(days, 1, pos), e -> CAST(e.x AS DOUBLE))),
        |    (acc, v) -> greatest(acc + v - mean - slack, CAST(0 AS DOUBLE))) AS cusum,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_slice(days, 1, pos), e -> CAST(e.x AS DOUBLE))),
        |    (acc, v) -> greatest(acc + v - mean - slack, CAST(0 AS DOUBLE))) > mean AS alarm
        |FROM expanded ORDER BY event_type, day""".stripMargin,
    "x107_source_drift" ->
      """WITH b AS (
        |  SELECT CAST((min(doc_id) + max(doc_id) + 1) // 2 AS BIGINT) AS mid
        |  FROM documents),
        |c AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN doc_id < b.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |    CAST(sum(CASE WHEN doc_id >= b.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_second
        |  FROM documents, b GROUP BY source),
        |t AS (SELECT CAST(sum(n_first) AS BIGINT) AS tot_first,
        |             CAST(sum(n_second) AS BIGINT) AS tot_second FROM c),
        |j AS (
        |  SELECT c.*, t.tot_first, t.tot_second,
        |    abs(CAST(c.n_first AS DECIMAL(38,0)) * CAST(t.tot_second AS DECIMAL(38,0))
        |      - CAST(c.n_second AS DECIMAL(38,0)) * CAST(t.tot_first AS DECIMAL(38,0))) AS drift_num
        |  FROM c, t),
        |tv AS (
        |  SELECT CAST(sum(drift_num) AS DOUBLE)
        |    / (2.0 * CAST(tot_first AS DOUBLE) * CAST(tot_second AS DOUBLE)) AS tvd_total
        |  FROM j GROUP BY tot_first, tot_second)
        |SELECT j.source, j.n_first, j.n_second,
        |  CAST(j.n_first AS DOUBLE) / CAST(j.tot_first AS DOUBLE) AS share_first,
        |  CAST(j.n_second AS DOUBLE) / CAST(j.tot_second AS DOUBLE) AS share_second,
        |  tv.tvd_total
        |FROM j, tv ORDER BY source""".stripMargin,
    "q42_data_quality" ->
      """SELECT * FROM (
        |  SELECT 'pk_unique_orders' AS "check", 'orders' AS table_name,
        |    CAST(count(*) AS BIGINT) AS n_violations, count(*) = 0 AS passed
        |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', 'lineitem',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'not_null_customer_name', 'customer',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM customer WHERE c_name IS NULL
        |  UNION ALL
        |  SELECT 'accepted_values_orderstatus', 'orders',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM orders WHERE o_orderstatus NOT IN ('F', 'O', 'P')
        |  UNION ALL
        |  SELECT 'range_quantity', 'lineitem',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
        |ORDER BY "check"""".stripMargin)
}
