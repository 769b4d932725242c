package graft.io

import graft.SparkSessionSpec
import graft.operators.TaxiQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventCodecSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  private def df(lines: String*) = lines.toDF("value")

  private val tripLine =
    """{"type": "trip", "trip_id": 7, "pickup_datetime": "2016-01-01T00:02:11.000Z",
      | "dropoff_datetime": "2016-01-01T00:18:34.000Z", "pickup_lat": 40.7648,
      | "pickup_lon": -73.9808, "dropoff_lat": 40.6413, "dropoff_lon": -73.7781,
      | "total_amount": 42.5}""".stripMargin.replaceAll("\n", "")

  test("snake_case wire fields map to the typed TripEvent") {
    val trips = EventCodec.trips(EventCodec.parseEvents(df(tripLine))).collect()
    assert(trips.length == 1)
    val t = trips(0)
    assert(t.trip_id == 7L)
    assert(t.pickup_lat == 40.7648 && t.dropoff_lon == -73.7781)
    assert(t.dropoff_datetime.getTime == 1451607514000L) // 00:18:34Z
  }

  test("malformed JSON lines are skipped, not failed") {
    val events = EventCodec.parseEvents(df(tripLine, "{oops", "not json at all"))
    assert(events.count() == 1)
  }

  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")

  test("unknown event type raises in strict mode") {
    val bad = """{"type": "mystery", "trip_id": 1}"""
    val e = intercept[Exception] {
      EventCodec.parseEvents(df(tripLine, bad)).count()
    }
    assert(messages(e).contains("unknown event type: mystery"))
  }

  test("missing type field raises in strict mode") {
    val bad = """{"trip_id": 1, "total_amount": 5.0}"""
    val e = intercept[Exception] {
      EventCodec.parseEvents(df(tripLine, bad)).count()
    }
    assert(messages(e).contains("event without type field"))
  }

  test("non-strict mode passes unknown types through") {
    val bad = """{"type": "mystery", "trip_id": 1}"""
    assert(EventCodec.parseEvents(df(tripLine, bad), strict = false)
      .count() == 2)
  }

  test("watermark events parse with their timestamp") {
    val wm = """{"type": "watermark", "watermark": "2016-01-01T00:15:00.000Z"}"""
    val out = EventCodec.watermarks(EventCodec.parseEvents(df(wm))).collect()
    assert(out.length == 1)
    assert(out(0).watermark.getTime == 1451607300000L)
  }

  test("toJsonLines round-trips a trip event") {
    val events = EventCodec.parseEvents(df(tripLine))
    val json = EventCodec.toJsonLines(
      EventCodec.trips(events).toDF()).as[String].collect()(0)
    val back = EventCodec.trips(EventCodec.parseEvents(
      df(s"""{"type": "trip", ${json.drop(1)}"""))).collect()(0)
    assert(back.trip_id == 7L && back.total_amount == 42.5)
  }
}

/** End-to-end semantics of the committed trips_tiny.jsonl fixture —
  * hand-computed goldens per the FixtureGen layout. */
class WireFixtureSpec extends AnyFunSuite with SparkSessionSpec {

  private lazy val events = EventCodec.parseEvents(
    spark.read.text("src/test/resources/trips_tiny.jsonl"))

  test("fixture parses: 12 trips + 3 watermarks, malformed line skipped") {
    assert(events.filter(col("type") === "trip").count() == 12)
    assert(events.filter(col("type") === "watermark").count() == 3)
  }

  test("Q1 on fixture: 3 windows for cell A, singletons suppressed") {
    val q1 = TaxiQueries.q1PickupHotspots(
      TaxiQueries.validNycTrips(events)).collect()
    assert(q1.length == 3)
    val counts = q1.map(r =>
      r.getAs[Long]("timestamp") -> r.getAs[Long]("pickup_count")).toMap
    val w = (m: Int) => 1451606400000L + m * 60000L - 1 // window end - 1ms
    assert(counts == Map(w(10) -> 3L, w(20) -> 2L, w(30) -> 2L))
    // boundary dropoff 00:20:00.000 belongs to [20:00, 30:00)
  }

  test("Q2 on fixture: one JFK row (floored minutes), LGA singleton suppressed") {
    val q2 = TaxiQueries.q2AirportDurations(
      TaxiQueries.validNycTrips(events)).collect()
    assert(q2.length == 1)
    val r = q2(0)
    assert(r.getAs[String]("airport_code") == "JFK")
    assert(r.getAs[Long]("sum_trip_duration") == 2L) // 121s->2 + 59s->0
    assert(r.getAs[Double]("avg_trip_duration") == 1.0)
    assert(r.getAs[Long]("timestamp") == 1451606400000L + 20 * 60000L - 1)
  }
}
