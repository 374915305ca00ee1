package graft.flights

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The demo-scale staging generator must be a faithful blow-up of the
  * golden fixtures: same schemas, demo-db row counts, primary keys
  * actually unique, and foreign keys actually resolvable — otherwise
  * the ScaleBench timings measure a pipeline over broken data.
  */
class ScaleFixtureSpec extends SparkSpec {

  private lazy val stg = ScaleFixture.staging(spark)

  test("row counts match the reference's demo-db shape") {
    assert(stg("aircrafts_data").count() == 9L)
    assert(stg("airports_data").count() == 104L)
    assert(stg("seats").count() == 1339L)
    assert(stg("flights").count() == 33121L)
    assert(stg("bookings").count() == 262788L)
    assert(stg("tickets").count() == 366733L)
    assert(stg("ticket_flights").count() == 1047809L)
    assert(stg("boarding_passes").count() == 582116L)
  }

  test("schemas match the golden fixtures") {
    // names + types must agree (nullability legitimately differs:
    // range-derived generator columns are provably non-null)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val golden = Fixtures.stg(spark)
    for ((name, df) <- stg)
      assert(shape(df) == shape(golden(name)),
        s"$name schema drifted:\n${shape(df)}\nvs\n${shape(golden(name))}")
  }

  test("primary keys are unique") {
    def dups(df: org.apache.spark.sql.DataFrame, keys: String*): Long =
      df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    assert(dups(stg("flights"), "flight_id") == 0L)
    assert(dups(stg("bookings"), "book_ref") == 0L)
    assert(dups(stg("tickets"), "ticket_no") == 0L)
    assert(dups(stg("seats"), "aircraft_code", "seat_no") == 0L)
    assert(dups(stg("ticket_flights"), "ticket_no", "flight_id") == 0L)
    assert(dups(stg("boarding_passes"), "ticket_no", "flight_id") == 0L)
  }

  test("foreign keys resolve and boarding seats exist on every aircraft") {
    def orphans(child: org.apache.spark.sql.DataFrame,
        parent: org.apache.spark.sql.DataFrame, keys: String*): Long =
      child.join(parent.select(keys.map(col): _*).distinct(), keys.toSeq, "left_anti").count()
    assert(orphans(stg("tickets"), stg("bookings"), "book_ref") == 0L)
    assert(orphans(stg("ticket_flights"), stg("tickets"), "ticket_no") == 0L)
    assert(orphans(stg("ticket_flights"), stg("flights"), "flight_id") == 0L)
    assert(orphans(stg("boarding_passes"), stg("ticket_flights"),
      "ticket_no", "flight_id") == 0L)
    assert(orphans(stg("flights"), stg("aircrafts_data"), "aircraft_code") == 0L)
    assert(orphans(stg("flights"), stg("airports_data").select(
      col("airport_code").as("departure_airport")).distinct()
      .crossJoin(stg("airports_data").select(col("airport_code").as("arrival_airport")).distinct()),
      "departure_airport", "arrival_airport") == 0L)
    // every boarding pass's seat is a real seat of the flight's aircraft
    val badSeats = stg("boarding_passes")
      .join(stg("flights").select("flight_id", "aircraft_code"), "flight_id")
      .join(stg("seats").select("aircraft_code", "seat_no"),
        Seq("aircraft_code", "seat_no"), "left_anti").count()
    assert(badSeats == 0L, s"$badSeats boarding passes reference nonexistent seats")
  }

  test("edge semantics survive the blow-up") {
    // cancelled / scheduled flights carry NULL actuals
    assert(stg("flights").filter(col("status").isin("Cancelled", "Scheduled") &&
      (col("actual_departure").isNotNull || col("actual_arrival").isNotNull)).count() == 0L)
    assert(stg("flights").filter(col("status") === "Cancelled").count() > 0L)
    // ~1/3 of passengers lack the email key; passengers repeat
    val emailless = stg("tickets")
      .filter(!col("contact_data").contains("email")).count().toDouble /
      stg("tickets").count()
    assert(emailless > 0.25 && emailless < 0.4, s"emailless ratio $emailless")
    assert(stg("tickets").select(countDistinct(col("passenger_id"))).head().getLong(0) == 300000L)
  }
}
