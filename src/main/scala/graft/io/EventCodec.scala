package graft.io

import graft.model.Events
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The engine's JSON wire codec (SURVEY.md §2.1 row S2), reproducing
  * the reference's two-layer error contract:
  *
  *  - malformed JSON lines are SKIPPED (the producer-side reader
  *    skips unparseable lines with a warning,
  *    TaxiEventReader.java:136-141);
  *  - well-formed JSON with a missing or unknown `type` RAISES in
  *    strict mode (the processor's deserializer throws
  *    IllegalArgumentException, events/kinesis/Event.java:41-52).
  *
  * Built on `from_json` + a raise_error guard inside a filter (a
  * filter predicate cannot be pruned by the optimizer, so the strict
  * check always runs alongside the scan, fully codegen'd).
  */
object EventCodec {

  /** Parse a Dataset/DataFrame of raw JSON lines (column `value`)
    * into the union event schema. */
  def parseEvents(lines: DataFrame, strict: Boolean = true): DataFrame = {
    // PERMISSIVE from_json returns an all-null struct for malformed
    // lines — indistinguishable from valid JSON with absent fields.
    // A corrupt-record column separates the two: malformed lines are
    // SKIPPED (TaxiEventReader.java:136-141), while valid JSON with a
    // missing/unknown type must RAISE below (Event.java:41-52).
    val schema = Events.wireSchema
      .add(org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType))
    val parsed = lines
      .select(from_json(col("value"), schema,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("e"))
      .filter(col("e").isNotNull && col("e._corrupt").isNull)
      .select(col("e.*"))
      .drop("_corrupt")
    if (!strict) parsed else strictTyped(parsed)
  }

  /** The strict layer alone: well-formed events with a missing or
    * unknown `type` RAISE (Event.java:41-52). Applied by
    * [[parseEvents]] after its malformed-line skip, and directly to
    * sources that already parse lines themselves (the wire-taxi
    * connector drops malformed lines in its reader — R1 — so this is
    * the only codec layer it still needs). */
  def strictTyped(events: DataFrame): DataFrame =
    events.filter(
      when(col("type").isNull,
        raise_error(lit("event without type field")))
      .when(!col("type").isin(Events.KnownTypes: _*),
        raise_error(concat(lit("unknown event type: "), col("type"))))
      .otherwise(lit(true)))

  /** Trip rows only, in the processor's TripEvent shape (F1 + M1:
    * type filter and typed downcast, ProcessTaxiStream.java:90-91). */
  def trips(events: DataFrame): Dataset[Events.TripEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("type") === "trip")
      .select(col("trip_id"), col("pickup_lat"), col("pickup_lon"),
        col("dropoff_lat"), col("dropoff_lon"), col("total_amount"),
        col("pickup_datetime"), col("dropoff_datetime"))
      .as[Events.TripEvent]
  }

  /** Watermark control rows (PunctuatedAssigner's trigger records,
    * PunctuatedAssigner.java:36-38). */
  def watermarks(events: DataFrame): Dataset[Events.WatermarkEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("type") === "watermark")
      .select(col("watermark")).as[Events.WatermarkEvent]
  }

  /** Serialize result documents back to the snake_case JSON wire
    * format (events/es/Document.java:34-37). */
  def toJsonLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
