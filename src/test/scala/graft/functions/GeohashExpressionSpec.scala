package graft.functions

import graft.SparkSessionSpec
import graft.geo.{Geofences, Geohash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeohashExpressionSpec extends AnyFunSuite with SparkSessionSpec {

  test("GeohashEncode matches pure-Scala encode (interpreted + codegen)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map { _ =>
      (rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
    }
    val df = pts.toDF("lat", "lon")
      .withColumn("gh6", GeoFunctions.geohash_encode($"lat", $"lon", 6))
      .withColumn("gh7", GeoFunctions.geohash_encode($"lat", $"lon", 7))
    val rows = df.collect()
    rows.foreach { r =>
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getString(2) == Geohash.encode(lat, lon, 6))
      assert(r.getString(3) == Geohash.encode(lat, lon, 7))
    }
  }

  test("expression participates in whole-stage codegen") {
    import spark.implicits._
    // non-foldable input so the projection actually runs in codegen
    val df = spark.range(1)
      .select((lit(40.64) + $"id" * 0.001).as("lat"),
        (lit(-73.77) - $"id" * 0.001).as("lon"))
      .select(GeoFunctions.geohash_encode($"lat", $"lon", 6).as("gh"))
    // "*(n)" marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [geohash_encode("), plan)
    assert(df.head().getString(0) == Geohash.encode(40.64, -73.77, 6))
  }

  test("GeohashCode is the integer the string renders in base-32") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 100).map { _ =>
      (rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
    }
    val rows = pts.toDF("lat", "lon")
      .select($"lat", $"lon",
        GeoFunctions.geohash_code($"lat", $"lon", 6).as("c6"),
        GeoFunctions.geohash_encode($"lat", $"lon", 6).as("g6"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == Geohash.cellCode(r.getString(3)))
      assert(r.getLong(2) == Geohash.code(r.getDouble(0), r.getDouble(1), 6))
    }
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((Some(40.64), None: Option[Double]))
      .toDF("lat", "lon")
      .select(GeoFunctions.geohash_encode($"lat", $"lon", 6).as("gh"))
    assert(df.head().isNullAt(0))
  }

  test("SQL registration") {
    GeoFunctions.register(spark)
    val r = spark.sql("SELECT geohash_encode(CAST(40.6413 AS DOUBLE), CAST(-73.7781 AS DOUBLE), 6) AS gh")
    assert(r.head().getString(0) == Geohash.encode(40.6413, -73.7781, 6))
  }

  test("fence columns match Geofences") {
    import spark.implicits._
    // centers of all fence cells + some outside points
    val pts =
      (Geofences.nycCells ++ Geofences.jfkCells ++ Geofences.lgaCells)
        .map(Geohash.bbox).map(b => (b.latCenter, b.lonCenter)) ++
        Seq((48.85, 2.35), (0.0, 0.0), (40.75, -73.98))
    val df = pts.toDF("lat", "lon").select($"lat", $"lon",
      GeoFunctions.near_nyc($"lat", $"lon").as("nyc"),
      GeoFunctions.near_jfk($"lat", $"lon").as("jfk"),
      GeoFunctions.near_lga($"lat", $"lon").as("lga"),
      GeoFunctions.valid_coords($"lat", $"lon").as("ok"))
    df.collect().foreach { r =>
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getBoolean(2) == Geofences.nearNYC(lat, lon), s"nyc $lat $lon")
      assert(r.getBoolean(3) == Geofences.nearJFK(lat, lon), s"jfk $lat $lon")
      assert(r.getBoolean(4) == Geofences.nearLGA(lat, lon), s"lga $lat $lon")
      assert(r.getBoolean(5))
    }
  }
}
