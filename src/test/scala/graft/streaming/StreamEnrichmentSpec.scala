package graft.streaming

import java.nio.file.Files

import graft.SparkSessionSpec
import graft.io.EventCodec
import graft.operators.TaxiQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two remaining streaming surfaces: stream-static dimension joins
  * (enriching the trip stream with a broadcastable lookup) and
  * streaming deduplication with a watermark (the standard fix for
  * at-least-once sources re-delivering events). */
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
}
