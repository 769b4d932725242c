package graft.operators

import graft.functions.GeoFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's two analytics as declarative DataFrame transforms
  * (SURVEY.md §2.2; ProcessTaxiStream.java:80-136). Batch and
  * streaming share these: the input may be a static or a streaming
  * DataFrame with the trip-event schema (§1.2).
  *
  * Catalyst gives us what the reference hand-ordered: the filters
  * stay below the aggregation (PushDownPredicates), unused columns
  * never leave the scan (ColumnPruning), and the filter+project
  * pipeline runs in one whole-stage-codegen span — see SURVEY.md §4.
  */
object TaxiQueries {

  /** Shared query prefix (operators F1, F2, F3 —
    * ProcessTaxiStream.java:90-93): keep `trip` events with valid
    * coordinates where both endpoints are inside the NYC fence. */
  def validNycTrips(events: DataFrame): DataFrame =
    events
      .filter(col("type") === "trip")
      .filter(valid_coords(col("pickup_lat"), col("pickup_lon")) &&
        valid_coords(col("dropoff_lat"), col("dropoff_lon")))
      .filter(near_nyc(col("pickup_lat"), col("pickup_lon")) &&
        near_nyc(col("dropoff_lat"), col("dropoff_lon")))

  /** Q1 — pickup hot spots (ProcessTaxiStream.java:96-106): count of
    * pickups per precision-6 geohash cell per 10-minute tumbling
    * event-time window (event time = dropoff), keeping cells with at
    * least MIN_PICKUP_COUNT=2 pickups. Output matches the
    * reference's PickupCount document: location, pickup_count,
    * timestamp (= window end − 1 ms, Flink `maxTimestamp`). */
  def q1PickupHotspots(trips: DataFrame): DataFrame =
    trips
      .select(
        geohash_encode(col("pickup_lat"), col("pickup_lon"), 6)
          .as("location"),
        col("dropoff_datetime"))
      .groupBy(col("location"), window(col("dropoff_datetime"), "10 minutes"))
      .agg(count(lit(1)).as("pickup_count"))
      .filter(col("pickup_count") >= 2)
      .select(
        col("location"),
        col("pickup_count"),
        (unix_millis(col("window.end")) - 1).as("timestamp"))

  /** Q2 — average trip duration to JFK/LGA
    * (ProcessTaxiStream.java:109-136): per pickup cell × airport ×
    * 10-minute window, SUM and AVG of the per-trip *floored integer
    * minute* duration; windows with a single trip are suppressed
    * (count > 1). JFK classification takes precedence over LGA
    * (else-if, ProcessTaxiStream.java:114-117). avg is double
    * division of the floored-minute sum by the count
    * (ProcessTaxiStream.java:132). */
  def q2AirportDurations(trips: DataFrame): DataFrame =
    trips
      .select(
        geohash_encode(col("pickup_lat"), col("pickup_lon"), 6)
          .as("location"),
        when(near_jfk(col("dropoff_lat"), col("dropoff_lon")), "JFK")
          .when(near_lga(col("dropoff_lat"), col("dropoff_lon")), "LGA")
          .as("airport_code"),
        floor((unix_millis(col("dropoff_datetime")) -
          unix_millis(col("pickup_datetime"))) / 60000L)
          .as("duration_min"),
        col("dropoff_datetime"))
      .filter(col("airport_code").isNotNull)
      .groupBy(col("location"), col("airport_code"),
        window(col("dropoff_datetime"), "10 minutes"))
      .agg(
        sum(col("duration_min")).as("sum_trip_duration"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(
        col("location"),
        col("airport_code"),
        col("sum_trip_duration"),
        (col("sum_trip_duration").cast("double") / col("cnt"))
          .as("avg_trip_duration"),
        (unix_millis(col("window.end")) - 1).as("timestamp"))
}
