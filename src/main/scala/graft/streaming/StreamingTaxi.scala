package graft.streaming

import graft.io.EventCodec
import graft.operators.TaxiQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming execution of the reference's taxi job
  * (ProcessTaxiStream.java:64-167), Spark-first:
  *
  *  - source: `readStream` over newline-JSON files (the offline stand-in
  *    for the Kinesis consumer, S1) decoded by the strict codec (S2);
  *  - event time: `withWatermark` on `dropoff_datetime` (P2). Spark's
  *    watermark is heuristic (max event time − delay per micro-batch)
  *    rather than the reference's punctuated control records — final
  *    window CONTENTS are identical, only emission timing differs
  *    (SURVEY.md §7.4). The producer's watermark records are consumed
  *    as monitoring rows ([[watermarkProgress]]), not as the clock;
  *  - state: windowed streaming aggregation in the RocksDB state store
  *    (C1, [[configureStateStore]]), checkpointed per query;
  *  - C2 event-time toggle: `eventTime = false` reproduces the
  *    reference's `--noeventtime` processing-time mode
  *    (ProcessTaxiStream.java:69-71) by windowing on ingestion time.
  */
object StreamingTaxi {

  val DefaultWatermarkDelay = "10 seconds"

  /** RocksDB state store + shuffle sizing for streaming state — the
    * Spark analogue of the reference's RocksDB backend
    * (ProcessTaxiStream.java:139-148). */
  def configureStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }

  /** Streaming source: newline-JSON files appearing under `dir`,
    * decoded strictly (S1 + S2). */
  def fromJsonFiles(spark: SparkSession, dir: String): DataFrame =
    EventCodec.parseEvents(
      spark.readStream.text(dir).toDF("value"))

  /** The same stream through the wire-taxi DataSourceV2 connector
    * (graft.sources.WireTaxiSource): per-file micro-batches with
    * source-side parsing; the codec's strict unknown-type layer still
    * applies on top (the connector's reader only skips malformed
    * lines, mirroring R1). */
  def fromWireSource(spark: SparkSession, dir: String): DataFrame =
    EventCodec.strictTyped(
      spark.readStream.format("wire-taxi").load(dir))

  /** The trip data path with event-time watermarking applied.
    * `eventTime = false` swaps in processing time (C2). */
  def tripStream(events: DataFrame,
      delay: String = DefaultWatermarkDelay,
      eventTime: Boolean = true): DataFrame = {
    val trips = TaxiQueries.validNycTrips(events)
    if (eventTime) trips.withWatermark("dropoff_datetime", delay)
    else trips.withColumn("dropoff_datetime", current_timestamp())
      .withWatermark("dropoff_datetime", "0 seconds")
  }

  /** Q1 over a watermarked trip stream — identical transform to the
    * batch path (TaxiQueries.q1PickupHotspots). */
  def q1(trips: DataFrame): DataFrame =
    TaxiQueries.q1PickupHotspots(trips)

  /** Q2 over a watermarked trip stream. */
  def q2(trips: DataFrame): DataFrame =
    TaxiQueries.q2AirportDurations(trips)

  /** Watermark control records as a monitoring stream (count + max
    * watermark seen) — the reference's punctuated watermarks surfaced
    * as telemetry rather than as the event-time clock (§7.4). */
  def watermarkProgress(events: DataFrame): DataFrame =
    events.filter(col("type") === "watermark")
      .select(col("watermark"))
      .agg(count(lit(1)).as("n_watermarks"),
        max(col("watermark")).as("max_watermark"))

  /** Append-mode writer with checkpointing; caller picks the sink via
    * `format` (memory for tests, parquet/foreachBatch in production). */
  def writer(df: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** Convenience: run to an in-memory table until no more data. */
  def runToMemory(df: DataFrame, name: String,
      checkpointDir: String): StreamingQuery =
    writer(df, checkpointDir, Trigger.AvailableNow())
      .format("memory").queryName(name).start()
}
