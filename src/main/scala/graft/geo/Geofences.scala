package graft.geo

/** Static geofence cell lists, reproducing the reference's fences
  * (flink-taxi-stream-processor/.../utils/GeoUtils.java:28-56):
  *
  *  - NYC: the 8 adjacent cells of `dr72` (center cell itself is
  *    EXCLUDED — `getAdjacent` returns neighbors only,
  *    GeoUtils.java:28).
  *  - JFK: the 8 adjacent cells of `dr5x0z` (GeoUtils.java:29).
  *  - LGA: {`dr5ryy`, `dr5rzn`} plus the 8 adjacent cells of the
  *    precision-7 cell `dr5rzjx` (GeoUtils.java:30-34) — note the
  *    mixed 6/7-char precision.
  *
  * Membership of a point in a fence = membership in ANY cell, where
  * cell membership is prefix semantics: encode(lat, lon, len(cell))
  * == cell (equivalent to the reference's bounding-box contains,
  * GeoUtils.java:40-51, up to measure-zero boundary points).
  */
object Geofences {

  val nycCells: Seq[String] = Geohash.neighbors8("dr72")
  val jfkCells: Seq[String] = Geohash.neighbors8("dr5x0z")
  val lgaCells: Seq[String] =
    Seq("dr5ryy", "dr5rzn") ++ Geohash.neighbors8("dr5rzjx")

  def nearNYC(lat: Double, lon: Double): Boolean =
    inFence(nycCells, lat, lon)
  def nearJFK(lat: Double, lon: Double): Boolean =
    inFence(jfkCells, lat, lon)
  def nearLGA(lat: Double, lon: Double): Boolean =
    inFence(lgaCells, lat, lon)

  /** Coordinate validity filter (GeoUtils.java:53-56). NaN compares
    * false, so NaN coordinates are rejected, matching Java. */
  def validCoords(lat: Double, lon: Double): Boolean =
    math.abs(lat) <= 90.0 && math.abs(lon) <= 180.0

  def inFence(cells: Seq[String], lat: Double, lon: Double): Boolean =
    cells.exists(c => Geohash.contains(c, lat, lon))
}
