package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Typed data model of the reference's wire format (SURVEY.md §1.2):
  * newline-delimited snake_case JSON with a `type` discriminator
  * (`"trip" | "watermark"`), timestamps ISO-8601
  * (events/kinesis/Event.java:30-33, TripEvent.java:21-44,
  * WatermarkEvent.java:21-32).
  */
object Events {

  /** Trip record; event time is the DROPOFF time
    * (TripEvent.java:41-43). */
  final case class TripEvent(
      trip_id: Long,
      pickup_lat: Double,
      pickup_lon: Double,
      dropoff_lat: Double,
      dropoff_lon: Double,
      total_amount: Double,
      pickup_datetime: Timestamp,
      dropoff_datetime: Timestamp)

  final case class WatermarkEvent(watermark: Timestamp)

  /** Q1 output document (events/es/PickupCount.java:19-29). */
  final case class PickupCount(
      location: String, pickup_count: Long, timestamp: Long)

  /** Q2 output document (events/es/TripDuration.java:19-33). */
  final case class TripDuration(
      location: String, airport_code: String, sum_trip_duration: Long,
      avg_trip_duration: Double, timestamp: Long)

  /** Union wire schema — superset of both event types; the `type`
    * column discriminates (events/kinesis/Event.java:35-54). */
  val wireSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("trip_id", LongType),
    StructField("pickup_lat", DoubleType),
    StructField("pickup_lon", DoubleType),
    StructField("dropoff_lat", DoubleType),
    StructField("dropoff_lon", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("watermark", TimestampType)))

  val KnownTypes: Seq[String] = Seq("trip", "watermark")
}
