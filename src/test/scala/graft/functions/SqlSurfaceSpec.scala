package graft.functions

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry path: a user who writes SQL strings (not DataFrame
  * code) gets the same engine — registered geohash function, temp
  * views over the fixture tables, and plans identical in result to
  * the DataFrame formulations the oracle grades. */
class SqlSurfaceSpec extends AnyFunSuite with SparkSessionSpec {

  private val sf = "/root/testdata/sf0.001"

  test("reference Q1 expressed as one SQL string matches the graded DataFrame plan") {
    GeoFunctions.register(spark)
    graft.sources.SyntheticTrips.fromEvents(spark, sf)
      .createOrReplaceTempView("trip_events")
    val viaSql = spark.sql(
      s"""SELECT geohash_encode(pickup_lat, pickup_lon, 6) AS location,
         |       COUNT(*) AS pickup_count,
         |       unix_millis(window.end) - 1 AS timestamp
         |FROM trip_events
         |WHERE type = 'trip'
         |  AND abs(pickup_lat) <= 90 AND abs(pickup_lon) <= 180
         |  AND abs(dropoff_lat) <= 90 AND abs(dropoff_lon) <= 180
         |  AND geohash_encode(pickup_lat, pickup_lon, 4)
         |      IN (${graft.geo.Geofences.nycCells.map(c => s"'$c'").mkString(",")})
         |  AND geohash_encode(dropoff_lat, dropoff_lon, 4)
         |      IN (${graft.geo.Geofences.nycCells.map(c => s"'$c'").mkString(",")})
         |GROUP BY geohash_encode(pickup_lat, pickup_lon, 6),
         |         window(dropoff_datetime, '10 minutes')
         |HAVING COUNT(*) >= 2""".stripMargin)
    val graded = graft.SparkEntry.queries("q1_pickup_hotspots")(spark, sf)
    assert(viaSql.collect().toSet == graded.collect().toSet)
  }

  test("SQL fences through the registered function are rewritten by the rule") {
    GeoFunctions.register(spark)
    import spark.implicits._
    // a point INSIDE the fence (center of a member cell — note the
    // fence is dr72's ring of neighbors, dr72 itself excluded)
    val in = graft.geo.Geohash.bbox(graft.geo.Geofences.nycCells.head)
    Seq((in.latCenter, in.lonCenter), (0.0, 0.0)).toDF("lat", "lon")
      .createOrReplaceTempView("pts")
    val df = spark.sql(
      s"""SELECT * FROM pts
         |WHERE geohash_encode(lat, lon, 4)
         |      IN (${graft.geo.Geofences.nycCells.map(c => s"'$c'").mkString(",")})"""
        .stripMargin)
    // LocalRelation columns are stored leaves -> the geofence rule fires
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.graft.GeohashEncode]))))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(in.latCenter))
  }
}
