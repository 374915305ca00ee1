package graft.flights

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The reference's Transform stage — 4 dimensions + 4 facts over the
  * `bookings` staging schema — as declarative DataFrame transforms
  * (reference execution order `dags/flights_data_pipeline.py:229-238`;
  * semantics reconstructed per SURVEY.md §2.3-§2.4 [R] from the ER
  * diagram `images/warehousestg.png` and the public demo-DB shape).
  *
  * Every transform takes the staging layer as `Map[table -> DataFrame]`,
  * so the same code runs over fixtures (golden tests + oracle queries)
  * and over any real staging location.
  *
  * Scale shape: dimensions are broadcast into fact joins (they are small
  * by construction — aircraft types, airports); facts join fact-to-fact
  * on their natural keys with shuffle hash/sort-merge under AQE.
  * Surrogate keys are `row_number` over the natural key — deterministic
  * (oracle-reproducible), and fine at scale because ONLY dims get them.
  */
object StarSchema {

  /** dim_aircrafts: JSON `$.en` model name (F2), range preserved. */
  def dimAircrafts(stg: Map[String, DataFrame]): DataFrame =
    stg("aircrafts_data")
      .select(
        row_number().over(Window.orderBy(col("aircraft_code"))).cast(LongType).as("aircraft_sk"),
        col("aircraft_code"),
        get_json_object(col("model"), "$.en").as("model_en"),
        col("aircraft_range"))
      .orderBy(col("aircraft_code"))

  /** dim_airport: JSON `$.en` name/city (F2) + geo point -> lon/lat (F3,
    * the reference's `point` column split — `regexp_extract` on the
    * "(lon,lat)" text form).
    */
  def dimAirport(stg: Map[String, DataFrame]): DataFrame = {
    val pt = "^\\(([^,]+),([^)]+)\\)$"
    stg("airports_data")
      .select(
        row_number().over(Window.orderBy(col("airport_code"))).cast(LongType).as("airport_sk"),
        col("airport_code"),
        get_json_object(col("airport_name"), "$.en").as("airport_name_en"),
        get_json_object(col("city"), "$.en").as("city_en"),
        regexp_extract(col("coordinates"), pt, 1).cast(DoubleType).as("lon"),
        regexp_extract(col("coordinates"), pt, 2).cast(DoubleType).as("lat"),
        col("timezone"))
      .orderBy(col("airport_code"))
  }

  /** dim_passenger: passengers exist only inside tickets -> dedup to one
    * row per passenger_id (A3; first ticket_no wins, deterministically),
    * JSON contact extraction with NULL for absent keys.
    */
  def dimPassenger(stg: Map[String, DataFrame]): DataFrame = {
    val firstTicket = Window.partitionBy(col("passenger_id")).orderBy(col("ticket_no"))
    stg("tickets")
      .withColumn("rn", row_number().over(firstTicket))
      .filter(col("rn") === 1)
      .select(
        row_number().over(Window.orderBy(col("passenger_id"))).cast(LongType).as("passenger_sk"),
        col("passenger_id"),
        col("passenger_name"),
        get_json_object(col("contact_data"), "$.phone").as("phone"),
        get_json_object(col("contact_data"), "$.email").as("email"))
      .orderBy(col("passenger_id"))
  }

  /** dim_seat: seats denormalized with the aircraft model (J5, broadcast
    * dim join).
    */
  def dimSeat(stg: Map[String, DataFrame]): DataFrame =
    stg("seats")
      .join(broadcast(stg("aircrafts_data").select(col("aircraft_code"), col("model"))),
        "aircraft_code")
      .select(
        row_number().over(Window.orderBy(col("aircraft_code"), col("seat_no")))
          .cast(LongType).as("seat_sk"),
        col("aircraft_code"), col("seat_no"), col("fare_conditions"),
        get_json_object(col("model"), "$.en").as("model_en"))
      .orderBy(col("aircraft_code"), col("seat_no"))

  /** fct_boarding_pass: boarding_passes enriched through ticket_flights,
    * tickets and flights (J1 — the fact legs join on natural keys, the
    * flight leg is broadcast-size here but would shuffle at scale).
    */
  def fctBoardingPass(stg: Map[String, DataFrame]): DataFrame =
    stg("boarding_passes")
      .select(col("ticket_no"), col("flight_id"), col("boarding_no"), col("seat_no"))
      .join(stg("ticket_flights").select(col("ticket_no"), col("flight_id"),
        col("fare_conditions"), col("amount")), Seq("ticket_no", "flight_id"))
      .join(stg("tickets").select(col("ticket_no"), col("book_ref"), col("passenger_id")),
        Seq("ticket_no"))
      .join(stg("flights").select(col("flight_id"), col("flight_no"),
        col("departure_airport"), col("arrival_airport"), col("scheduled_departure")),
        Seq("flight_id"))
      .select(col("ticket_no"), col("flight_id"), col("boarding_no"), col("seat_no"),
        col("passenger_id"), col("book_ref"), col("flight_no"),
        col("departure_airport"), col("arrival_airport"), col("scheduled_departure"),
        col("fare_conditions"), col("amount"))
      .orderBy(col("ticket_no"), col("flight_id"))

  /** fct_booking_ticket: bookings joined through tickets to per-flight
    * ticket segments (J2), with the booking-grain amount rollup as a
    * window (A4).
    */
  def fctBookingTicket(stg: Map[String, DataFrame]): DataFrame =
    stg("bookings").select(col("book_ref"), col("book_date"), col("total_amount"))
      .join(stg("tickets").select(col("ticket_no"), col("book_ref"), col("passenger_id")),
        Seq("book_ref"))
      .join(stg("ticket_flights").select(col("ticket_no"), col("flight_id"),
        col("fare_conditions"), col("amount")), Seq("ticket_no"))
      .join(stg("flights").select(col("flight_id"), col("flight_no")), Seq("flight_id"))
      .withColumn("booking_amount_sum",
        sum(col("amount")).over(Window.partitionBy(col("book_ref"))))
      .select(col("book_ref"), col("ticket_no"), col("flight_id"), col("passenger_id"),
        col("flight_no"), col("fare_conditions"), col("amount"),
        col("book_date"), col("total_amount"), col("booking_amount_sum"))
      .orderBy(col("book_ref"), col("ticket_no"), col("flight_id"))

  /** fct_flight_activity: per-flight delays in minutes (F4, NULL-safe for
    * cancelled flights) with double-aliased airport dim (J3) and aircraft
    * dim, both broadcast.
    */
  def fctFlightActivity(stg: Map[String, DataFrame]): DataFrame = {
    val airports = stg("airports_data")
      .select(col("airport_code"), get_json_object(col("city"), "$.en").as("city_en"))
    val minutes = (a: String, b: String) =>
      ((unix_timestamp(col(a)) - unix_timestamp(col(b))).cast(DoubleType) / 60.0)
    stg("flights")
      .join(broadcast(airports.select(col("airport_code").as("departure_airport"),
        col("city_en").as("dep_city_en"))), Seq("departure_airport"))
      .join(broadcast(airports.select(col("airport_code").as("arrival_airport"),
        col("city_en").as("arr_city_en"))), Seq("arrival_airport"))
      .join(broadcast(stg("aircrafts_data").select(col("aircraft_code"),
        get_json_object(col("model"), "$.en").as("model_en"))), Seq("aircraft_code"))
      .select(col("flight_id"), col("flight_no"), col("status"), col("model_en"),
        col("departure_airport"), col("dep_city_en"),
        col("arrival_airport"), col("arr_city_en"),
        col("scheduled_departure"),
        minutes("actual_departure", "scheduled_departure").as("dep_delay_min"),
        minutes("actual_arrival", "scheduled_arrival").as("arr_delay_min"),
        minutes("scheduled_arrival", "scheduled_departure").as("sched_duration_min"))
      .orderBy(col("flight_id"))
  }

  /** fct_seat_occupied_daily: per (flight date, flight) occupancy vs the
    * aircraft's seat capacity. LEFT join keeps zero-passenger flights
    * (J4); capacity is the A2 sub-aggregate.
    */
  def fctSeatOccupiedDaily(stg: Map[String, DataFrame]): DataFrame = {
    val occupied = stg("boarding_passes")
      .groupBy(col("flight_id")).agg(count(lit(1)).as("occupied"))
    val capacity = stg("seats")
      .groupBy(col("aircraft_code")).agg(count(lit(1)).as("capacity"))
    stg("flights")
      .join(occupied, Seq("flight_id"), "left")
      .join(broadcast(capacity), Seq("aircraft_code"))
      .select(
        to_date(col("scheduled_departure")).as("flight_date"),
        col("flight_id"), col("flight_no"), col("aircraft_code"),
        coalesce(col("occupied"), lit(0L)).as("occupied"),
        col("capacity"),
        (coalesce(col("occupied"), lit(0L)).cast(DoubleType) /
          col("capacity").cast(DoubleType)).as("occupancy_rate"))
      .orderBy(col("flight_date"), col("flight_id"))
  }

  /** The 8 transforms in the reference's execution order: dims, then
    * facts (`dags/flights_data_pipeline.py:229-251`).
    */
  val transforms: Seq[(String, Map[String, DataFrame] => DataFrame)] = Seq(
    "dim_aircrafts" -> (dimAircrafts _),
    "dim_airport" -> (dimAirport _),
    "dim_passenger" -> (dimPassenger _),
    "dim_seat" -> (dimSeat _),
    "fct_boarding_pass" -> (fctBoardingPass _),
    "fct_booking_ticket" -> (fctBookingTicket _),
    "fct_flight_activity" -> (fctFlightActivity _),
    "fct_seat_occupied_daily" -> (fctSeatOccupiedDaily _))

  /** Decimal columns -> DOUBLE at the graded-query boundary only: the
    * transforms keep exact DECIMAL(10,2) money internally, but decimal
    * MATERIALIZATION differs between Spark parquet and DuckDB in the
    * driver compare, while the correctly-rounded decimal->double value
    * is engine-independent.
    */
  private def gradedOutput(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.DecimalType =>
          col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)

  /** Driver-gradable queries: each transform over the literal fixtures
    * (sfDir intentionally unused — the star schema has its own staging
    * tables, carried inside the oracle SQL as VALUES). f09 exercises the
    * native `parse_point` Catalyst expression end-to-end against the
    * same oracle the regexp spelling uses.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    transforms.zipWithIndex.map { case ((name, fn), i) =>
      f"f${i + 1}%02d_$name" ->
        ((s: SparkSession, _: String) => gradedOutput(fn(Fixtures.stg(s))))
    }.toMap + ("f09_geo_point_native" -> ((s: SparkSession, _: String) => {
      graft.functions.ParsePoint.register(s)
      Fixtures.df(s, Fixtures.airportsData)
        .select(col("airport_code"),
          expr("parse_point(coordinates).lon").as("lon"),
          expr("parse_point(coordinates).lat").as("lat"))
        .orderBy(col("airport_code"))
    }))

  private val W = Fixtures.withClause

  val oracles: Map[String, String] = Map(
    "f01_dim_aircrafts" -> (W +
      " SELECT CAST(row_number() OVER (ORDER BY aircraft_code) AS BIGINT) AS aircraft_sk," +
      " aircraft_code, json_extract_string(model, '$.en') AS model_en, aircraft_range" +
      " FROM aircrafts_data ORDER BY aircraft_code"),
    "f02_dim_airport" -> (W +
      " SELECT CAST(row_number() OVER (ORDER BY airport_code) AS BIGINT) AS airport_sk," +
      " airport_code, json_extract_string(airport_name, '$.en') AS airport_name_en," +
      " json_extract_string(city, '$.en') AS city_en," +
      " CAST(regexp_extract(coordinates, '^\\(([^,]+),([^)]+)\\)$', 1) AS DOUBLE) AS lon," +
      " CAST(regexp_extract(coordinates, '^\\(([^,]+),([^)]+)\\)$', 2) AS DOUBLE) AS lat," +
      " \"timezone\" FROM airports_data ORDER BY airport_code"),
    "f03_dim_passenger" -> (W + ", first_t AS (" +
      " SELECT *, row_number() OVER (PARTITION BY passenger_id ORDER BY ticket_no) AS rn" +
      " FROM tickets)" +
      " SELECT CAST(row_number() OVER (ORDER BY passenger_id) AS BIGINT) AS passenger_sk," +
      " passenger_id, passenger_name," +
      " json_extract_string(contact_data, '$.phone') AS phone," +
      " json_extract_string(contact_data, '$.email') AS email" +
      " FROM first_t WHERE rn = 1 ORDER BY passenger_id"),
    "f04_dim_seat" -> (W +
      " SELECT CAST(row_number() OVER (ORDER BY s.aircraft_code, s.seat_no) AS BIGINT) AS seat_sk," +
      " s.aircraft_code, s.seat_no, s.fare_conditions," +
      " json_extract_string(a.model, '$.en') AS model_en" +
      " FROM seats s JOIN aircrafts_data a ON s.aircraft_code = a.aircraft_code" +
      " ORDER BY s.aircraft_code, s.seat_no"),
    "f05_fct_boarding_pass" -> (W +
      " SELECT bp.ticket_no, bp.flight_id, bp.boarding_no, bp.seat_no," +
      " t.passenger_id, t.book_ref, f.flight_no," +
      " f.departure_airport, f.arrival_airport, f.scheduled_departure," +
      " tf.fare_conditions, CAST(tf.amount AS DOUBLE) AS amount" +
      " FROM boarding_passes bp" +
      " JOIN ticket_flights tf ON bp.ticket_no = tf.ticket_no AND bp.flight_id = tf.flight_id" +
      " JOIN tickets t ON bp.ticket_no = t.ticket_no" +
      " JOIN flights f ON bp.flight_id = f.flight_id" +
      " ORDER BY bp.ticket_no, bp.flight_id"),
    "f06_fct_booking_ticket" -> (W +
      " SELECT b.book_ref, t.ticket_no, tf.flight_id, t.passenger_id," +
      " f.flight_no, tf.fare_conditions, CAST(tf.amount AS DOUBLE) AS amount," +
      " b.book_date, CAST(b.total_amount AS DOUBLE) AS total_amount," +
      " CAST(sum(tf.amount) OVER (PARTITION BY b.book_ref) AS DOUBLE) AS booking_amount_sum" +
      " FROM bookings b" +
      " JOIN tickets t ON b.book_ref = t.book_ref" +
      " JOIN ticket_flights tf ON t.ticket_no = tf.ticket_no" +
      " JOIN flights f ON tf.flight_id = f.flight_id" +
      " ORDER BY b.book_ref, t.ticket_no, tf.flight_id"),
    "f07_fct_flight_activity" -> (W +
      " SELECT f.flight_id, f.flight_no, f.status," +
      " json_extract_string(ac.model, '$.en') AS model_en," +
      " f.departure_airport, json_extract_string(dep.city, '$.en') AS dep_city_en," +
      " f.arrival_airport, json_extract_string(arr.city, '$.en') AS arr_city_en," +
      " f.scheduled_departure," +
      " (epoch(f.actual_departure) - epoch(f.scheduled_departure)) / 60.0 AS dep_delay_min," +
      " (epoch(f.actual_arrival) - epoch(f.scheduled_arrival)) / 60.0 AS arr_delay_min," +
      " (epoch(f.scheduled_arrival) - epoch(f.scheduled_departure)) / 60.0 AS sched_duration_min" +
      " FROM flights f" +
      " JOIN airports_data dep ON f.departure_airport = dep.airport_code" +
      " JOIN airports_data arr ON f.arrival_airport = arr.airport_code" +
      " JOIN aircrafts_data ac ON f.aircraft_code = ac.aircraft_code" +
      " ORDER BY f.flight_id"),
    "f09_geo_point_native" -> (W +
      " SELECT airport_code," +
      " CAST(regexp_extract(coordinates, '^\\(([^,]+),([^)]+)\\)$', 1) AS DOUBLE) AS lon," +
      " CAST(regexp_extract(coordinates, '^\\(([^,]+),([^)]+)\\)$', 2) AS DOUBLE) AS lat" +
      " FROM airports_data ORDER BY airport_code"),
    "f08_fct_seat_occupied_daily" -> (W + ", occ AS (" +
      " SELECT flight_id, count(*) AS occupied FROM boarding_passes GROUP BY flight_id)," +
      " cap AS (SELECT aircraft_code, count(*) AS capacity FROM seats GROUP BY aircraft_code)" +
      " SELECT CAST(f.scheduled_departure AS DATE) AS flight_date," +
      " f.flight_id, f.flight_no, f.aircraft_code," +
      " coalesce(occ.occupied, 0) AS occupied, cap.capacity," +
      " CAST(coalesce(occ.occupied, 0) AS DOUBLE) / CAST(cap.capacity AS DOUBLE) AS occupancy_rate" +
      " FROM flights f LEFT JOIN occ ON f.flight_id = occ.flight_id" +
      " JOIN cap ON f.aircraft_code = cap.aircraft_code" +
      " ORDER BY flight_date, f.flight_id"))
}
