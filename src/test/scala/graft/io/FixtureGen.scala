package graft.io

import java.nio.file.{Files, Paths}

import graft.geo.{Geofences, Geohash}

/** Deterministic generator for `src/test/resources/trips_tiny.jsonl`
  * (FIXTURES.md §A case 1). Run once and commit the output:
  * `sbt "Test/runMain graft.io.FixtureGen"`.
  *
  * Layout (hand-checkable goldens, asserted in WireFixtureSpec):
  *   trips 1-3  : pickup cellA, dropoff cellB, windows W1 → Q1 count 3
  *   trip  4    : pickup cellB, W1 → suppressed (HAVING >= 2)
  *   trips 5-6  : pickup cellA, dropoff JFK, W2, durations 121 s → 2 min
  *                and 59 s → 0 min (floor) → Q2 (A, JFK): sum 2, avg 1.0
  *   trip  7    : pickup cellB, dropoff LGA, W2 → Q2 suppressed (> 1)
  *   trip  8    : invalid coords (95, 200) → dropped by F2
  *   trip  9    : pickup in dr72 center (fence EXCLUDES center) → dropped
  *   trip 10    : dropoff far outside NYC (0, 0) → dropped by F3
  *   trips 11-12: dropoff exactly on the W3 boundary (00:20:00.000)
  *                → belong to W3 = [20:00, 30:00) → Q1 count 2
  *   3 watermark lines interleaved; 1 malformed line (skipped)
  */
object FixtureGen {

  private def center(cell: String): (Double, Double) = {
    val b = Geohash.bbox(cell)
    (b.latCenter, b.lonCenter)
  }

  def lines: Seq[String] = {
    val (aLat, aLon) = center(Geofences.nycCells.head + "00")
    val (bLat, bLon) = center(Geofences.nycCells(1) + "00")
    val (jLat, jLon) = center(Geofences.jfkCells.head)
    val (lLat, lLon) = center(Geofences.lgaCells.head)
    val (xLat, xLon) = center("dr72") // excluded fence center

    def trip(id: Long, pLat: Double, pLon: Double, dLat: Double,
        dLon: Double, pickup: String, dropoff: String, amt: Double) =
      s"""{"type": "trip", "trip_id": $id, "pickup_datetime": "$pickup", """ +
        s""""dropoff_datetime": "$dropoff", "pickup_lat": $pLat, """ +
        s""""pickup_lon": $pLon, "dropoff_lat": $dLat, "dropoff_lon": $dLon, """ +
        s""""total_amount": $amt}"""
    def wm(ts: String) =
      s"""{"type": "watermark", "watermark": "$ts"}"""
    def t(hms: String) = s"2016-01-01T$hms" + "Z"

    Seq(
      trip(1, aLat, aLon, bLat, bLon, t("00:00:11.000"), t("00:05:00.000"), 10.0),
      trip(2, aLat, aLon, bLat, bLon, t("00:01:00.000"), t("00:06:30.000"), 11.5),
      wm(t("00:06:30.000")),
      trip(3, aLat, aLon, bLat, bLon, t("00:02:00.000"), t("00:09:59.999"), 12.0),
      trip(4, bLat, bLon, aLat, aLon, t("00:01:30.000"), t("00:07:00.000"), 9.0),
      trip(5, aLat, aLon, jLat, jLon, t("00:10:59.000"), t("00:13:00.000"), 52.0), // 121 s -> 2 min
      trip(6, aLat, aLon, jLat, jLon, t("00:13:01.000"), t("00:14:00.000"), 48.0), // 59 s -> 0 min
      wm(t("00:14:00.000")),
      trip(7, bLat, bLon, lLat, lLon, t("00:05:00.000"), t("00:15:00.000"), 30.0),
      trip(8, 95.0, 200.0, bLat, bLon, t("00:03:00.000"), t("00:16:00.000"), 1.0),
      trip(9, xLat, xLon, bLat, bLon, t("00:04:00.000"), t("00:17:00.000"), 2.0),
      trip(10, aLat, aLon, 0.0, 0.0, t("00:05:00.000"), t("00:18:00.000"), 3.0),
      """{"malformed line - must be skipped by the codec""",
      trip(11, aLat, aLon, bLat, bLon, t("00:12:00.000"), t("00:20:00.000"), 7.0),
      trip(12, aLat, aLon, bLat, bLon, t("00:13:00.000"), t("00:20:00.000"), 8.0),
      wm(t("00:20:00.000")))
  }

  val OutPath = "src/test/resources/trips_tiny.jsonl"

  def main(args: Array[String]): Unit = {
    Files.createDirectories(Paths.get("src/test/resources"))
    Files.writeString(Paths.get(OutPath), lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.size} lines to $OutPath")
  }
}
