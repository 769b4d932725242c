package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.io.{BulkIndexSink, EventCodec, LocalDirTransport}
import graft.operators.TaxiQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The exactly-once story end-to-end: RocksDB-checkpointed streaming
  * state (C1) + the idempotent bulk sink (SK1). A query is stopped
  * mid-stream and a NEW query resumes from the same checkpoint; the
  * final index equals the batch result — windows spanning the restart
  * are recovered from state, and re-delivered documents overwrite
  * idempotently instead of duplicating. */
class CheckpointRecoverySpec extends AnyFunSuite with SparkSessionSpec {
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

  test("restart from checkpoint recovers window state; idempotent sink dedups") {
    StreamingTaxi.configureStateStore(spark)
    val cp = Files.createTempDirectory("cp-recover").toString
    val indexDir = Files.createTempDirectory("index").toString
    val writerFn = BulkIndexSink.foreachBatchWriter(
      Seq("location", "timestamp"), new LocalDirTransport(indexDir))

    // phase 1: first half of the fixture, then stop (simulated crash)
    val ms1 = MemoryStream[String]
    val q1a = StreamingTaxi.q1(StreamingTaxi.tripStream(
      EventCodec.parseEvents(ms1.toDF().toDF("value"))))
    val run1 = StreamingTaxi.writer(q1a, cp,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .foreachBatch(writerFn).start()
    val (half1, half2) = fixtureLines.splitAt(8)
    ms1.addData(half1: _*)
    run1.processAllAvailable()
    run1.stop()

    // phase 2: new query, same checkpoint, rest of the data + flushes.
    // A MemoryStream source resumes from its recorded offset, so the
    // new stream must replay half1 (offset 0 was consumed pre-crash —
    // re-adding it exercises the sink's idempotence) plus half2.
    val ms2 = MemoryStream[String]
    ms2.addData(half1: _*)
    val q1b = StreamingTaxi.q1(StreamingTaxi.tripStream(
      EventCodec.parseEvents(ms2.toDF().toDF("value"))))
    val run2 = StreamingTaxi.writer(q1b, cp,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .foreachBatch(writerFn).start()
    ms2.addData(half2: _*)
    run2.processAllAvailable()
    ms2.addData(flushLine("2016-02-01T00:00:00.000Z"))
    run2.processAllAvailable()
    ms2.addData(flushLine("2016-02-01T01:00:00.000Z"))
    run2.processAllAvailable()
    run2.stop()

    // the index holds exactly the batch Q1 result — no dupes, no loss
    val batch = TaxiQueries.q1PickupHotspots(TaxiQueries.validNycTrips(
        EventCodec.parseEvents(fixtureLines.toDF("value")))).count()
    val indexed = new java.io.File(indexDir).listFiles()
      .count(_.getName.endsWith(".json"))
    assert(indexed == batch)
    assert(indexed > 0)
  }
}
