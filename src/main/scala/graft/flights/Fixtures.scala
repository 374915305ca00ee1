package graft.flights

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthetic `bookings`-schema fixtures for the star-schema transforms —
  * the reference's staging tables (ER diagram
  * `/root/reference/images/warehousestg.png`; audit columns id /
  * created_at / updated_at per the reference's extract,
  * `/root/reference/dags/flights_data_pipeline.py:103-109`).
  *
  * ONE source of truth: each table's rows are literal strings here and are
  * materialized two ways — as typed Spark DataFrames (via cast/
  * to_timestamp under the UTC session, so JVM default timezone never
  * matters) and as DuckDB `VALUES` CTEs for the oracle SQL (so the
  * driver's correctness gate needs no side files).
  *
  * Edge cases baked in (FIXTURES.md §2): a flight with zero boarding
  * passes, a cancelled flight with NULL actuals, a passenger on two
  * tickets, contact_data missing the email key, updated_at values exactly
  * on day boundaries (00:00:00 / 23:59:59) across 3 distinct days, and a
  * day with no rows for some tables.
  */
object Fixtures {

  sealed trait Kind
  case object S extends Kind // string
  case object I extends Kind // int32
  case object TS extends Kind // timestamp (string form "yyyy-MM-dd HH:mm:ss")
  case object DEC extends Kind // decimal(10,2)

  final case class Col(name: String, kind: Kind)
  final case class Table(name: String, cols: Seq[Col], rows: Seq[Seq[String]])

  private def audit(ds: String*): Seq[Seq[String]] =
    ds.map(u => Seq("2024-05-01 00:00:00", u))

  // updated_at spans 3 days with boundary values; day 2024-06-11 has no
  // aircrafts/seats rows at all (skip-on-empty coverage).
  val aircraftsData: Table = Table("aircrafts_data",
    Seq(Col("id", I), Col("aircraft_code", S), Col("model", S),
      Col("aircraft_range", I), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "320", "{\"en\": \"Airbus A320-200\", \"xx\": \"A320\"}", "5700",
        "2024-05-01 00:00:00", "2024-06-10 00:00:00"),
      Seq("2", "763", "{\"en\": \"Boeing 767-300\", \"xx\": \"B763\"}", "7900",
        "2024-05-01 00:00:00", "2024-06-10 23:59:59"),
      Seq("3", "CR2", "{\"en\": \"Bombardier CRJ-200\", \"xx\": \"CRJ\"}", "2700",
        "2024-05-01 00:00:00", "2024-06-12 08:15:00")))

  val airportsData: Table = Table("airports_data",
    Seq(Col("id", I), Col("airport_code", S), Col("airport_name", S), Col("city", S),
      Col("coordinates", S), Col("timezone", S), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "DME", "{\"en\": \"Domodedovo International Airport\"}",
        "{\"en\": \"Moscow\"}", "(37.906111,55.408611)", "Europe/Moscow",
        "2024-05-01 00:00:00", "2024-06-10 09:00:00"),
      Seq("2", "LED", "{\"en\": \"Pulkovo Airport\"}",
        "{\"en\": \"St. Petersburg\"}", "(30.262503,59.800292)", "Europe/Moscow",
        "2024-05-01 00:00:00", "2024-06-11 00:00:00"),
      Seq("3", "AER", "{\"en\": \"Sochi International Airport\"}",
        "{\"en\": \"Sochi\"}", "(39.956589,43.449928)", "Europe/Moscow",
        "2024-05-01 00:00:00", "2024-06-11 23:59:59"),
      Seq("4", "OVB", "{\"en\": \"Tolmachevo Airport\"}",
        "{\"en\": \"Novosibirsk\"}", "(82.650656,55.012622)", "Asia/Novosibirsk",
        "2024-05-01 00:00:00", "2024-06-12 12:00:00")))

  val seats: Table = Table("seats",
    Seq(Col("id", I), Col("aircraft_code", S), Col("seat_no", S),
      Col("fare_conditions", S), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "320", "1A", "Business", "2024-05-01 00:00:00", "2024-06-10 06:00:00"),
      Seq("2", "320", "1B", "Business", "2024-05-01 00:00:00", "2024-06-10 06:00:00"),
      Seq("3", "320", "10A", "Economy", "2024-05-01 00:00:00", "2024-06-10 06:00:00"),
      Seq("4", "320", "10B", "Economy", "2024-05-01 00:00:00", "2024-06-12 06:00:00"),
      Seq("5", "320", "10C", "Economy", "2024-05-01 00:00:00", "2024-06-12 06:00:00"),
      Seq("6", "763", "2A", "Business", "2024-05-01 00:00:00", "2024-06-10 07:00:00"),
      Seq("7", "763", "20A", "Economy", "2024-05-01 00:00:00", "2024-06-10 07:00:00"),
      Seq("8", "763", "20B", "Economy", "2024-05-01 00:00:00", "2024-06-12 07:00:00"),
      Seq("9", "CR2", "5A", "Economy", "2024-05-01 00:00:00", "2024-06-10 08:00:00"),
      Seq("10", "CR2", "5B", "Economy", "2024-05-01 00:00:00", "2024-06-10 08:00:00")))

  val flights: Table = Table("flights",
    Seq(Col("id", I), Col("flight_id", I), Col("flight_no", S),
      Col("scheduled_departure", TS), Col("scheduled_arrival", TS),
      Col("departure_airport", S), Col("arrival_airport", S), Col("status", S),
      Col("aircraft_code", S), Col("actual_departure", TS), Col("actual_arrival", TS),
      Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "1", "PG0001", "2024-06-01 08:00:00", "2024-06-01 09:30:00",
        "DME", "LED", "Arrived", "320", "2024-06-01 08:05:00", "2024-06-01 09:40:00",
        "2024-05-01 00:00:00", "2024-06-10 00:00:00"),
      Seq("2", "2", "PG0002", "2024-06-01 10:00:00", "2024-06-01 13:00:00",
        "DME", "OVB", "Arrived", "763", "2024-06-01 10:00:00", "2024-06-01 12:55:00",
        "2024-05-01 00:00:00", "2024-06-10 14:00:00"),
      Seq("3", "3", "PG0003", "2024-06-02 11:00:00", "2024-06-02 12:10:00",
        "LED", "DME", "Cancelled", "CR2", null, null,
        "2024-05-01 00:00:00", "2024-06-10 23:59:59"),
      Seq("4", "4", "PG0004", "2024-06-02 15:00:00", "2024-06-02 17:00:00",
        "AER", "DME", "Arrived", "320", "2024-06-02 15:30:00", "2024-06-02 17:45:00",
        "2024-05-01 00:00:00", "2024-06-11 00:00:00"),
      Seq("5", "5", "PG0005", "2024-06-03 09:00:00", "2024-06-03 10:30:00",
        "OVB", "AER", "Scheduled", "763", null, null,
        "2024-05-01 00:00:00", "2024-06-11 23:59:59"),
      Seq("6", "6", "PG0006", "2024-06-03 12:00:00", "2024-06-03 13:00:00",
        "DME", "LED", "On Time", "CR2", null, null,
        "2024-05-01 00:00:00", "2024-06-12 10:00:00")))

  val bookings: Table = Table("bookings",
    Seq(Col("id", I), Col("book_ref", S), Col("book_date", TS),
      Col("total_amount", DEC), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "B00001", "2024-05-20 10:00:00", "120000.00", "2024-05-01 00:00:00", "2024-06-10 05:00:00"),
      Seq("2", "B00002", "2024-05-21 11:30:00", "65000.50", "2024-05-01 00:00:00", "2024-06-10 23:59:59"),
      Seq("3", "B00003", "2024-05-22 09:15:00", "30000.00", "2024-05-01 00:00:00", "2024-06-11 12:00:00"),
      Seq("4", "B00004", "2024-05-23 18:45:00", "18500.25", "2024-05-01 00:00:00", "2024-06-12 00:00:00"),
      Seq("5", "B00005", "2024-05-24 23:59:59", "9900.00", "2024-05-01 00:00:00", "2024-06-12 23:59:59")))

  val tickets: Table = Table("tickets",
    Seq(Col("id", I), Col("ticket_no", S), Col("book_ref", S), Col("passenger_id", S),
      Col("passenger_name", S), Col("contact_data", S), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "0005432000001", "B00001", "P100", "ALICE SMITH",
        "{\"phone\": \"+70000000001\", \"email\": \"alice@example.com\"}",
        "2024-05-01 00:00:00", "2024-06-10 06:30:00"),
      Seq("2", "0005432000002", "B00001", "P101", "BOB JONES",
        "{\"phone\": \"+70000000002\"}",
        "2024-05-01 00:00:00", "2024-06-10 06:30:00"),
      Seq("3", "0005432000003", "B00002", "P102", "CAROL WHITE",
        "{\"phone\": \"+70000000003\", \"email\": \"carol@example.com\"}",
        "2024-05-01 00:00:00", "2024-06-11 00:00:00"),
      Seq("4", "0005432000004", "B00002", "P100", "ALICE SMITH",
        "{\"phone\": \"+70000000001\", \"email\": \"alice@example.com\"}",
        "2024-05-01 00:00:00", "2024-06-11 09:00:00"),
      Seq("5", "0005432000005", "B00003", "P103", "DAN BROWN",
        "{\"phone\": \"+70000000004\", \"email\": \"dan@example.com\"}",
        "2024-05-01 00:00:00", "2024-06-11 23:59:59"),
      Seq("6", "0005432000006", "B00004", "P104", "EVE BLACK",
        "{\"phone\": \"+70000000005\", \"email\": \"eve@example.com\"}",
        "2024-05-01 00:00:00", "2024-06-12 07:45:00"),
      Seq("7", "0005432000007", "B00005", "P105", "FRANK GREEN",
        "{\"phone\": \"+70000000006\"}",
        "2024-05-01 00:00:00", "2024-06-12 23:59:59")))

  val ticketFlights: Table = Table("ticket_flights",
    Seq(Col("id", I), Col("ticket_no", S), Col("flight_id", I),
      Col("fare_conditions", S), Col("amount", DEC), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "0005432000001", "1", "Business", "50000.00", "2024-05-01 00:00:00", "2024-06-10 06:45:00"),
      Seq("2", "0005432000001", "2", "Economy", "20000.00", "2024-05-01 00:00:00", "2024-06-10 06:45:00"),
      Seq("3", "0005432000002", "1", "Economy", "25000.00", "2024-05-01 00:00:00", "2024-06-10 07:10:00"),
      Seq("4", "0005432000002", "2", "Economy", "25000.00", "2024-05-01 00:00:00", "2024-06-10 07:10:00"),
      Seq("5", "0005432000003", "2", "Economy", "35000.50", "2024-05-01 00:00:00", "2024-06-11 08:00:00"),
      Seq("6", "0005432000004", "1", "Business", "30000.00", "2024-05-01 00:00:00", "2024-06-11 08:30:00"),
      Seq("7", "0005432000005", "3", "Economy", "30000.00", "2024-05-01 00:00:00", "2024-06-11 12:00:00"),
      Seq("8", "0005432000006", "4", "Economy", "18500.25", "2024-05-01 00:00:00", "2024-06-12 09:00:00"),
      Seq("9", "0005432000007", "6", "Economy", "9900.00", "2024-05-01 00:00:00", "2024-06-12 11:30:00")))

  val boardingPasses: Table = Table("boarding_passes",
    Seq(Col("id", I), Col("ticket_no", S), Col("flight_id", I),
      Col("boarding_no", I), Col("seat_no", S), Col("created_at", TS), Col("updated_at", TS)),
    Seq(
      Seq("1", "0005432000001", "1", "1", "1A", "2024-05-01 00:00:00", "2024-06-10 07:30:00"),
      Seq("2", "0005432000002", "1", "2", "10A", "2024-05-01 00:00:00", "2024-06-10 07:31:00"),
      Seq("3", "0005432000004", "1", "3", "1B", "2024-05-01 00:00:00", "2024-06-11 09:30:00"),
      Seq("4", "0005432000001", "2", "1", "2A", "2024-05-01 00:00:00", "2024-06-10 09:00:00"),
      Seq("5", "0005432000002", "2", "2", "20A", "2024-05-01 00:00:00", "2024-06-10 09:01:00"),
      Seq("6", "0005432000003", "2", "3", "20B", "2024-05-01 00:00:00", "2024-06-11 09:02:00"),
      Seq("7", "0005432000006", "4", "1", "10B", "2024-05-01 00:00:00", "2024-06-12 14:00:00")))

  /** All 8 staging tables in the reference's FK-safe load order
    * (reference `start.sh:20-23`).
    */
  val all: Seq[Table] = Seq(aircraftsData, airportsData, bookings, tickets,
    seats, flights, ticketFlights, boardingPasses)

  /** Typed Spark DataFrame for a fixture table. Strings are parsed with
    * to_timestamp / cast under the UTC session timezone — never the JVM
    * default — so Spark and DuckDB agree on every instant.
    */
  def df(s: SparkSession, t: Table): DataFrame = {
    val schema = StructType(t.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val raw = s.createDataFrame(
      java.util.Arrays.asList(t.rows.map(r => Row(r: _*)): _*), schema)
    raw.select(t.cols.map { c =>
      c.kind match {
        case S => col(c.name)
        case I => col(c.name).cast(IntegerType).as(c.name)
        case TS => to_timestamp(col(c.name)).as(c.name)
        case DEC => col(c.name).cast(DecimalType(10, 2)).as(c.name)
      }
    }: _*)
  }

  /** The full staging layer: table name -> typed DataFrame. */
  def stg(s: SparkSession): Map[String, DataFrame] =
    all.map(t => t.name -> df(s, t)).toMap

  private def sqlLit(v: String, k: Kind): String =
    if (v == null) "NULL"
    else k match {
      case S => "'" + v.replace("'", "''") + "'"
      case I => v
      case TS => "TIMESTAMP '" + v + "'"
      case DEC => "CAST('" + v + "' AS DECIMAL(10,2))"
    }

  private def cte(t: Table): String = {
    val cols = t.cols.map(c => "\"" + c.name + "\"").mkString(", ")
    val vals = t.rows
      .map(r => "(" + r.zip(t.cols).map { case (v, c) => sqlLit(v, c.kind) }.mkString(", ") + ")")
      .mkString(", ")
    t.name + " AS (SELECT * FROM (VALUES " + vals + ") AS _t(" + cols + "))"
  }

  /** `WITH <all 8 tables as VALUES>` prefix for the DuckDB oracle SQL —
    * the oracle carries its own input data, no side files.
    */
  val withClause: String = "WITH " + all.map(cte).mkString(", ")
}
