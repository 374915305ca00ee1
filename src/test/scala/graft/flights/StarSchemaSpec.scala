package graft.flights

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Golden assertions for the reconstructed transform semantics — the
  * reference's SQL is LFS-hidden, so these tests ARE the contract
  * (SURVEY.md §5.5): hand-computed expectations over the literal
  * fixtures, pinning each FIXTURES.md §2 edge case.
  */
class StarSchemaSpec extends SparkSpec {

  private lazy val stg = Fixtures.stg(spark)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  test("dim_aircrafts extracts the en model name") {
    val rows = rowsOf(StarSchema.dimAircrafts(stg))
    assert(rows.map(r => (r.getAs[String]("aircraft_code"), r.getAs[String]("model_en"))) ==
      Seq(("320", "Airbus A320-200"), ("763", "Boeing 767-300"), ("CR2", "Bombardier CRJ-200")))
  }

  test("dim_airport splits the geo point into lon/lat") {
    val dme = rowsOf(StarSchema.dimAirport(stg)).find(_.getAs[String]("airport_code") == "DME").get
    assert(dme.getAs[Double]("lon") == 37.906111 && dme.getAs[Double]("lat") == 55.408611)
    assert(dme.getAs[String]("city_en") == "Moscow")
  }

  test("dim_passenger dedups the two-ticket passenger and nulls absent email") {
    val rows = rowsOf(StarSchema.dimPassenger(stg))
    assert(rows.length == 6, "7 tickets but 6 distinct passengers")
    assert(rows.count(_.getAs[String]("passenger_id") == "P100") == 1)
    val bob = rows.find(_.getAs[String]("passenger_id") == "P101").get
    assert(bob.getAs[String]("phone") == "+70000000002" && bob.getAs[String]("email") == null)
  }

  test("dim_seat denormalizes the aircraft model") {
    val rows = rowsOf(StarSchema.dimSeat(stg))
    assert(rows.length == 10)
    assert(rows.filter(_.getAs[String]("aircraft_code") == "CR2")
      .forall(_.getAs[String]("model_en") == "Bombardier CRJ-200"))
  }

  test("fct_boarding_pass joins segment fare and flight route") {
    val rows = rowsOf(StarSchema.fctBoardingPass(stg))
    assert(rows.length == 7)
    val r = rows.find(r => r.getAs[String]("ticket_no") == "0005432000004" &&
      r.getAs[Int]("flight_id") == 1).get
    assert(r.getAs[String]("seat_no") == "1B" &&
      r.getAs[String]("passenger_id") == "P100" &&
      r.getAs[String]("departure_airport") == "DME" &&
      r.getAs[java.math.BigDecimal]("amount").doubleValue() == 30000.0)
  }

  test("fct_booking_ticket rolls the booking amount sum up as a window") {
    val rows = rowsOf(StarSchema.fctBookingTicket(stg))
    assert(rows.length == 9)
    // B00001: ALICE 50000+20000 + BOB 25000+25000 = 120000
    assert(rows.filter(_.getAs[String]("book_ref") == "B00001")
      .forall(_.getAs[java.math.BigDecimal]("booking_amount_sum").doubleValue() == 120000.0))
  }

  test("fct_flight_activity computes delays and is NULL-safe for cancelled") {
    val rows = rowsOf(StarSchema.fctFlightActivity(stg))
    val delayed = rows.find(_.getAs[Int]("flight_id") == 4).get
    assert(delayed.getAs[Double]("dep_delay_min") == 30.0 &&
      delayed.getAs[Double]("arr_delay_min") == 45.0 &&
      delayed.getAs[Double]("sched_duration_min") == 120.0)
    val cancelled = rows.find(_.getAs[Int]("flight_id") == 3).get
    assert(cancelled.isNullAt(cancelled.fieldIndex("dep_delay_min")) &&
      cancelled.isNullAt(cancelled.fieldIndex("arr_delay_min")))
  }

  test("fct_seat_occupied_daily keeps the zero-passenger flight") {
    val rows = rowsOf(StarSchema.fctSeatOccupiedDaily(stg))
    assert(rows.length == 6, "every flight appears, boarded or not")
    val empty = rows.find(_.getAs[Int]("flight_id") == 5).get
    assert(empty.getAs[Long]("occupied") == 0L && empty.getAs[Long]("capacity") == 3L &&
      empty.getAs[Double]("occupancy_rate") == 0.0)
    val full = rows.find(_.getAs[Int]("flight_id") == 1).get
    assert(full.getAs[Long]("occupied") == 3L && full.getAs[Long]("capacity") == 5L)
  }
}
