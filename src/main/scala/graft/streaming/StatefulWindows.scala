package graft.streaming

import graft.model.Events.PickupCount
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Q1's windowed count re-expressed through the engine's CUSTOM
  * STATEFUL OPERATOR surface (`flatMapGroupsWithState`) — the Spark
  * analogue of the reference's full-window `apply` with RocksDB state
  * (ProcessTaxiStream.java:99-105, SURVEY.md §4.2): state is an
  * explicit per-(cell, window) count, and emission happens when the
  * event-time clock (watermark) passes the window end — the same
  * firing rule Flink applies when the punctuated watermark passes
  * `window.maxTimestamp`.
  *
  * The production path stays the declarative windowed aggregation
  * (TaxiQueries.q1PickupHotspots — partial aggregation, codegen); this
  * operator exists to prove the custom-state API carries the same
  * semantics (StatefulWindowsSpec asserts equality), and as the
  * extension point for logic windows can't express (e.g. per-key
  * early/ speculative emission, custom eviction).
  */
object StatefulWindows {

  val WindowMs: Long = 600000L
  val MinPickupCount = 2L

  final case class CellWindow(location: String, window_start: Long)

  /** Streaming Q1 over an (already watermarked) trip stream: key =
    * (pickup geohash-6 cell, window start); a group's count lives in
    * GroupState; an EventTimeTimeout set to window end + 1 ms fires
    * once the watermark passes the window, emitting the PickupCount
    * iff it meets the threshold (HAVING >= 2). */
  def q1Stateful(trips: DataFrame): Dataset[PickupCount] = {
    import trips.sparkSession.implicits._
    // the watermarked column must flow INTO the stateful operator —
    // projecting it away makes the analyzer reject EventTimeTimeout
    val keyed = trips
      .select(
        graft.functions.GeoFunctions
          .geohash_encode(col("pickup_lat"), col("pickup_lon"), 6)
          .as("location"),
        col("dropoff_datetime"))
      .withColumn("window_start",
        (unix_millis(col("dropoff_datetime")) / WindowMs).cast("long") * WindowMs)
      .select(col("location"), col("window_start"), col("dropoff_datetime"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey { case (loc, ws, _) => CellWindow(loc, ws) }

    keyed.flatMapGroupsWithState[Long, PickupCount](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: CellWindow, rows: Iterator[(String, Long, java.sql.Timestamp)],
          state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          // watermark passed window end: fire once, like the
          // reference's window firing on the punctuated watermark
          val count = state.get
          state.remove()
          if (count >= MinPickupCount)
            Iterator.single(PickupCount(key.location, count,
              key.window_start + WindowMs - 1))
          else Iterator.empty
        } else {
          state.update(state.getOption.getOrElse(0L) + rows.size)
          state.setTimeoutTimestamp(key.window_start + WindowMs)
          Iterator.empty
        }
    }
  }
}
