package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.io.EventCodec
import graft.operators.TaxiQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surfaces beyond the reference dataflow: stream-static
  * dimension joins (enriching the trip stream with a broadcastable
  * lookup), stream-stream event-time interval joins (watermarks on
  * BOTH sides bound the join state, which is what makes the join
  * runnable unbounded), and streaming deduplication with a watermark
  * (the standard fix for at-least-once sources re-delivering). */
class StreamEnrichmentSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private lazy val fixtureLines: Seq[String] =
    scala.io.Source.fromFile("src/test/resources/trips_tiny.jsonl",
      "UTF-8").getLines().toSeq

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("stream-static join enriches trips with a cell dimension") {
    // static dim: geohash-4 prefix -> region name
    val dim = graft.geo.Geofences.nycCells.zipWithIndex
      .map { case (c, i) => (c, s"region_$i") }.toDF("cell4", "region")

    val ms = MemoryStream[String]
    val trips = TaxiQueries.validNycTrips(
      EventCodec.parseEvents(ms.toDF().toDF("value")))
    val enriched = trips
      .withColumn("cell4", graft.functions.GeoFunctions
        .geohash_encode(col("pickup_lat"), col("pickup_lon"), 4))
      .join(broadcast(dim), "cell4")

    val q = StreamingTaxi.writer(enriched, tmp("cp"),
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .format("memory").queryName("enriched_trips").start()
    ms.addData(fixtureLines: _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("enriched_trips").collect()
    assert(rows.length == 9) // every valid NYC trip got a region
    assert(rows.forall(_.getAs[String]("region").startsWith("region_")))
  }

  test("stream-stream interval join correlates trips with payment events") {
    // two independent watermarked streams joined on trip_id with an
    // event-time interval bound — the watermarks let Spark expire
    // join state, which is what makes the join runnable unbounded
    val trips = MemoryStream[String]
    val tripSide = TaxiQueries.validNycTrips(
        EventCodec.parseEvents(trips.toDF().toDF("value")))
      .select(col("trip_id"), col("dropoff_datetime"))
      .withWatermark("dropoff_datetime", "10 seconds")
    val pays = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val paySide = pays.toDF().toDF("pay_trip_id", "pay_time", "amount")
      .withWatermark("pay_time", "10 seconds")

    val joined = tripSide.join(paySide,
      col("trip_id") === col("pay_trip_id") &&
        col("pay_time") >= col("dropoff_datetime") &&
        col("pay_time") <= col("dropoff_datetime") + expr("INTERVAL 1 HOUR"))

    val q = StreamingTaxi.writer(joined, tmp("cp"),
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .format("memory").queryName("trip_payments").start()

    trips.addData(fixtureLines: _*)
    q.processAllAvailable()
    // payments: trip 1 pays 5 min after dropoff (match), trip 2 pays
    // 2 h after (outside the interval), trip 999 never had a trip
    val drop1 = java.sql.Timestamp.from(
      java.time.Instant.parse("2016-01-01T00:05:00Z")) // trip 1 dropoff
    val in5min = java.sql.Timestamp.from(
      java.time.Instant.parse("2016-01-01T00:10:00Z"))
    val in2h = java.sql.Timestamp.from(
      java.time.Instant.parse("2016-01-01T02:10:00Z"))
    pays.addData((1L, in5min, 12.5), (2L, in2h, 9.0), (999L, in5min, 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("trip_payments").collect()
    assert(rows.length == 1, s"expected exactly the in-window payment, got ${rows.length}")
    assert(rows.head.getAs[Long]("trip_id") == 1L)
    assert(rows.head.getAs[Double]("amount") == 12.5)
    assert(rows.head.getAs[java.sql.Timestamp]("dropoff_datetime") == drop1)
  }

  test("streaming dropDuplicates suppresses re-delivered events") {
    val ms = MemoryStream[String]
    val trips = TaxiQueries.validNycTrips(
        EventCodec.parseEvents(ms.toDF().toDF("value")))
      .withWatermark("dropoff_datetime", "10 seconds")
      .dropDuplicates("trip_id", "dropoff_datetime")
    val q = StreamingTaxi.writer(trips, tmp("cp"),
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .format("memory").queryName("dedup_trips").start()

    // deliver the fixture twice in full, then one more partial replay
    ms.addData(fixtureLines: _*)
    q.processAllAvailable()
    ms.addData(fixtureLines: _*)
    q.processAllAvailable()
    ms.addData(fixtureLines.take(5): _*)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_trips")
    assert(out.count() == 9) // one row per distinct valid trip
    assert(out.select("trip_id").distinct().count() == 9)
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    // plain dropDuplicates keeps every key forever — unbounded state
    // on an unbounded stream. The WithinWatermark variant evicts keys
    // once the watermark passes them: the configuration that survives
    // at 100 TB, correct whenever re-deliveries arrive within the
    // watermark delay (true for retry-based at-least-once sources).
    val ms = MemoryStream[String]
    val trips = TaxiQueries.validNycTrips(
        EventCodec.parseEvents(ms.toDF().toDF("value")))
      .withWatermark("dropoff_datetime", "10 seconds")
      .dropDuplicatesWithinWatermark("trip_id")
    val q = StreamingTaxi.writer(trips, tmp("cp"),
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .format("memory").queryName("dedup_wm_trips").start()

    ms.addData(fixtureLines: _*) // full fixture + an immediate re-delivery
    ms.addData(fixtureLines: _*)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_wm_trips")
    assert(out.count() == 9)
    assert(out.select("trip_id").distinct().count() == 9)
  }
}
