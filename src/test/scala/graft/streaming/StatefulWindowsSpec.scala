package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.io.EventCodec
import graft.operators.TaxiQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulWindowsSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private lazy val fixtureLines: Seq[String] =
    scala.io.Source.fromFile("src/test/resources/trips_tiny.jsonl",
      "UTF-8").getLines().toSeq

  private def flushLine(iso: String): String = {
    val p = graft.geo.Geohash.bbox(graft.geo.Geofences.nycCells.head)
    val d = graft.geo.Geohash.bbox(graft.geo.Geofences.jfkCells.head)
    s"""{"type": "trip", "trip_id": 999, "pickup_datetime": "$iso", """ +
      s""""dropoff_datetime": "$iso", "pickup_lat": ${p.latCenter}, """ +
      s""""pickup_lon": ${p.lonCenter}, "dropoff_lat": ${d.latCenter}, """ +
      s""""dropoff_lon": ${d.lonCenter}, "total_amount": 1.0}"""
  }

  test("flatMapGroupsWithState Q1 equals the declarative windowed Q1") {
    val telemetry = new ProgressTelemetry
    spark.streams.addListener(telemetry)
    val ms = MemoryStream[String]
    val events = EventCodec.parseEvents(ms.toDF().toDF("value"))
    val stateful = StatefulWindows.q1Stateful(
      StreamingTaxi.tripStream(events))
    val query = StreamingTaxi.writer(stateful.toDF(),
        Files.createTempDirectory("cp").toString,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .format("memory").queryName("q1_stateful").start()

    ms.addData(fixtureLines: _*)
    query.processAllAvailable()
    ms.addData(flushLine("2016-02-01T00:00:00.000Z"))
    query.processAllAvailable()
    ms.addData(flushLine("2016-02-01T01:00:00.000Z"))
    query.processAllAvailable()
    query.stop()
    spark.streams.removeListener(telemetry)

    val stateful_rows = spark.table("q1_stateful")
      .select("location", "pickup_count", "timestamp").collect().toSet
    val batch = TaxiQueries.q1PickupHotspots(TaxiQueries.validNycTrips(
        EventCodec.parseEvents(fixtureLines.toDF("value"))))
      .collect().toSet
    assert(stateful_rows == batch)
    assert(stateful_rows.nonEmpty)

    // R9 telemetry captured the run
    assert(telemetry.totalRows.get >= fixtureLines.size)
    assert(telemetry.batches.get >= 2)
    assert(telemetry.lastWatermark.get.startsWith("2016-02-01"))
  }
}
