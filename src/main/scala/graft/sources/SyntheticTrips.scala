package graft.sources

import graft.geo.{Geofences, Geohash}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic trip-event derivation from the `events` fixture
  * table (TESTDATA.md). The driver's correctness oracle runs DuckDB
  * over the same parquet files, so the taxi queries (SURVEY.md §2.2)
  * need trip records derivable with *bit-identical* arithmetic in
  * both engines. This object is the single spec: the Spark side
  * ([[SyntheticTrips.fromEvents]]) and the oracle side
  * ([[graft.oracle.OracleSql.validNycTripsCtes]]) both follow it term
  * for term.
  *
  * Derivation (uid = event_id, all integer/IEEE-double ops):
  *  - type     = 'watermark' if uid % 25 = 1 else 'trip'        (F1)
  *  - p_idx    = (uid * 2654435761) % 21 — pickup anchor; index 20
  *    is the dr72 center cell, which the NYC fence *excludes*
  *    (GeoUtils.java:28), so those trips must be filtered.     (F3)
  *  - invalid  = uid % 97 = 0 → pickup (95.0, 200.0), outside
  *    valid coordinate range.                                  (F2)
  *  - d_hash   = (uid * 40503) % 100: <15 → JFK cell (index
  *    (uid*97)%8), <30 → LGA cell ((uid*97)%10), else NYC cell
  *    ((uid*97)%20).                                          (FM1)
  *  - jitter   u1..u4 = ((uid*31)%97)/97.0, ((uid*37)%89)/89.0,
  *    ((uid*41)%83)/83.0, ((uid*43)%79)/79.0.
  *  - point    = anchorLow + anchorSpan * u (stays inside the
  *    anchor's geohash cell: low = min + 0.1*size,
  *    span = 0.8*size).
  *  - dropoff_ms = 1704067200000 + (uid * 262147) % 60000000
  *    (100 ten-minute windows starting 2024-01-01T00:00Z).
  *  - pickup_ms  = dropoff_ms - 60000 - (uid * 104729) % 5400000.
  *  - total_amount = ((uid * 53) % 10000) / 100.0.
  */
object SyntheticTrips {

  /** One anchor cell: point = (latLow + latSpan*u, lonLow + lonSpan*v). */
  final case class Anchor(cell: String, latLow: Double, latSpan: Double,
      lonLow: Double, lonSpan: Double)

  private def anchor(cell: String): Anchor = {
    val b = Geohash.bbox(cell)
    Anchor(cell,
      latLow = b.latMin + 0.1 * b.latSize, latSpan = 0.8 * b.latSize,
      lonLow = b.lonMin + 0.1 * b.lonSize, lonSpan = 0.8 * b.lonSize)
  }

  /** 20 Manhattan-ish pickup cells inside `dr5ru` (prefix `dr5r` is
    * in the NYC fence) plus the poisoned dr72-center anchor at
    * index 20 (dr72 itself is excluded from the fence). */
  val pickupAnchors: IndexedSeq[Anchor] =
    Geohash.Alphabet.take(20).map(c => anchor(s"dr5ru$c")).toIndexedSeq :+
      anchor("dr72")

  val jfkAnchors: IndexedSeq[Anchor] =
    Geofences.jfkCells.map(anchor).toIndexedSeq
  val lgaAnchors: IndexedSeq[Anchor] =
    Geofences.lgaCells.map(anchor).toIndexedSeq
  /** NYC (non-airport) dropoff anchors = the 20 valid pickup cells. */
  val nycDropAnchors: IndexedSeq[Anchor] = pickupAnchors.take(20)

  val T0Millis: Long = 1704067200000L // 2024-01-01T00:00:00Z
  val WindowMillis: Long = 600000L    // 10 minutes
  val NWindows: Long = 100L

  /** Spark-side derivation: events parquet → trip-event DataFrame
    * with the reference's wire schema (SURVEY.md §1.2): trip_id,
    * type, pickup/dropoff lat/lon, total_amount,
    * pickup_datetime/dropoff_datetime (TimestampType, UTC).
    * Only the `event_id` column is read from parquet (column
    * pruning — the scan stays 1-column at any scale). */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // events.parquet stores `ts` as TIMESTAMP(NANOS); Spark rejects the
    // file schema outright without this legacy flag even though only
    // `event_id` is selected. Runtime-settable, so set it here where
    // any session (driver-created included) passes through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    derive(spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id")))
  }

  def derive(events: DataFrame): DataFrame = {
    val uid = col("event_id")

    def pick(anchors: IndexedSeq[Anchor], idx: Column, low: Anchor => Double,
        span: Anchor => Double, u: Column): Column =
      element_at(array(anchors.map(a => lit(low(a))): _*),
        (idx + 1).cast("int")) +
        element_at(array(anchors.map(a => lit(span(a))): _*),
          (idx + 1).cast("int")) * u

    val u1 = (uid * 31 % 97).cast("double") / 97.0
    val u2 = (uid * 37 % 89).cast("double") / 89.0
    val u3 = (uid * 41 % 83).cast("double") / 83.0
    val u4 = (uid * 43 % 79).cast("double") / 79.0
    val pIdx = uid * 2654435761L % 21
    val dHash = uid * 40503 % 100
    val jIdx = uid * 97 % 8
    val lIdx = uid * 97 % 10
    val nIdx = uid * 97 % 20
    val invalid = uid % 97 === 0

    val dropoffMs = lit(T0Millis) + uid * 262147 % (NWindows * WindowMillis)
    val pickupMs = dropoffMs - 60000L - uid * 104729 % 5400000L

    events.select(
      uid.as("trip_id"),
      when(uid % 25 === 1, "watermark").otherwise("trip").as("type"),
      when(invalid, 95.0)
        .otherwise(pick(pickupAnchors, pIdx, _.latLow, _.latSpan, u1))
        .as("pickup_lat"),
      when(invalid, 200.0)
        .otherwise(pick(pickupAnchors, pIdx, _.lonLow, _.lonSpan, u2))
        .as("pickup_lon"),
      when(dHash < 15, pick(jfkAnchors, jIdx, _.latLow, _.latSpan, u3))
        .when(dHash < 30, pick(lgaAnchors, lIdx, _.latLow, _.latSpan, u3))
        .otherwise(pick(nycDropAnchors, nIdx, _.latLow, _.latSpan, u3))
        .as("dropoff_lat"),
      when(dHash < 15, pick(jfkAnchors, jIdx, _.lonLow, _.lonSpan, u4))
        .when(dHash < 30, pick(lgaAnchors, lIdx, _.lonLow, _.lonSpan, u4))
        .otherwise(pick(nycDropAnchors, nIdx, _.lonLow, _.lonSpan, u4))
        .as("dropoff_lon"),
      ((uid * 53 % 10000).cast("double") / 100.0).as("total_amount"),
      timestamp_millis(pickupMs).as("pickup_datetime"),
      timestamp_millis(dropoffMs).as("dropoff_datetime"))
  }
}
