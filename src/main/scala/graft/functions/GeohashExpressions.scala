package graft.functions

import graft.geo.{Geofences, Geohash}
import org.apache.spark.sql.graft.{Bridge, GeohashCode, GeohashEncode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level function DSL for the geo capabilities (SURVEY.md §2
  * rows M2, F2, F3, FM1). */
object GeoFunctions {

  def geohash_encode(lat: Column, lon: Column, precision: Int): Column =
    Bridge.column(GeohashEncode(
      Bridge.expression(lat),
      Bridge.expression(lon),
      Bridge.expression(lit(precision))))

  /** Coordinate validity (GeoUtils.java:53-56): |lat|<=90, |lon|<=180.
    * NaN-safe: NaN fails the comparison, as in Java. */
  def valid_coords(lat: Column, lon: Column): Column =
    abs(lat) <= 90.0 && abs(lon) <= 180.0

  /** Integer cell code (the base-32 string's value) — allocation-free
    * cell identity for fence predicates. */
  def geohash_code(lat: Column, lon: Column, precision: Int): Column =
    Bridge.column(GeohashCode(
      Bridge.expression(lat),
      Bridge.expression(lon),
      Bridge.expression(lit(precision))))

  private def fence(cells: Seq[String], lat: Column,
      lon: Column): Column =
    cells.groupBy(_.length).toSeq.sortBy(_._1).map { case (len, cs) =>
      geohash_code(lat, lon, len).isin(cs.map(Geohash.cellCode): _*)
    }.reduce(_ || _)

  /** Point inside the 8-cell NYC fence (GeoUtils.java:40-43). */
  def near_nyc(lat: Column, lon: Column): Column =
    fence(Geofences.nycCells, lat, lon)

  /** Point inside the 8-cell JFK fence (GeoUtils.java:45-47). */
  def near_jfk(lat: Column, lon: Column): Column =
    fence(Geofences.jfkCells, lat, lon)

  /** Point inside the mixed-precision LGA fence (GeoUtils.java:30-34,
    * :49-51). */
  def near_lga(lat: Column, lon: Column): Column =
    fence(Geofences.lgaCells, lat, lon)

  /** Register SQL-callable functions on a session (the UDF/extension
    * registration surface — SURVEY.md §2.4). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohash_encode",
      exprs => GeohashEncode(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
  }
}
