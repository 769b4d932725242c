package graft.geo

/** Pure-Scala geohash codec (public-domain base-32 algorithm; see
  * reference usage of `ch.hsr.geohash` at
  * flink-taxi-stream-processor/.../utils/GeoUtils.java:28-34 — we
  * implement the algorithm ourselves, no third-party dependency).
  *
  * Encoding uses the direct index formula rather than midpoint
  * bisection:
  *   lonIdx = floor((lon+180)/360 * 2^lonBits)   (clamped to range)
  *   latIdx = floor((lat+90)/180 * 2^latBits)
  * then bit-interleaves lon/lat (lon first) and base-32 encodes.
  * This is mathematically identical to bisection and has the useful
  * property that it can be mirrored exactly in ANSI SQL (the DuckDB
  * oracle), giving bit-for-bit parity between engine and oracle.
  */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  private val charIndex: Map[Char, Int] =
    Alphabet.zipWithIndex.toMap

  /** Number of longitude bits for a given precision (lon gets the
    * extra bit when the total 5p is odd). */
  def lonBits(precision: Int): Int = (5 * precision + 1) / 2
  def latBits(precision: Int): Int = (5 * precision) / 2

  /** Encode a WGS84 point to a geohash of `precision` characters.
    * Valid for |lat| <= 90, |lon| <= 180 (boundary values map to the
    * outermost cell). Precision 1..12. */
  def encode(lat: Double, lon: Double, precision: Int): String =
    toBase32(code(lat, lon, precision), precision)

  /** The 5·precision-bit interleaved cell code — the integer a
    * geohash string is the base-32 rendering of. Cheaper than
    * [[encode]] (no string allocation); two points share a cell at
    * `precision` iff their codes are equal. */
  def code(lat: Double, lon: Double, precision: Int): Long = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val nLon = lonBits(precision)
    val nLat = latBits(precision)
    val lonIdx = index(lon, 180.0, 360.0, nLon)
    val latIdx = index(lat, 90.0, 180.0, nLat)
    interleave(lonIdx, nLon, latIdx, nLat)
  }

  /** Integer cell code of a geohash string (base-32 decode). */
  def cellCode(gh: String): Long = {
    var c = 0L
    gh.foreach { ch =>
      val v = charIndex.getOrElse(ch.toLower,
        throw new IllegalArgumentException(
          s"invalid geohash char '$ch' in \"$gh\""))
      c = (c << 5) | v
    }
    c
  }

  /** floor((v+off)/span * 2^bits) clamped into [0, 2^bits). */
  private def index(v: Double, off: Double, span: Double,
      bits: Int): Long = {
    val n = 1L << bits
    val i = math.floor((v + off) / span * n).toLong
    if (i < 0) 0L else if (i >= n) n - 1 else i
  }

  /** Interleave lon/lat index bits, lon bit first (MSB). */
  private def interleave(lonIdx: Long, nLon: Int, latIdx: Long,
      nLat: Int): Long = {
    var code = 0L
    var li = nLon - 1
    var ti = nLat - 1
    var i = 0
    val total = nLon + nLat
    while (i < total) {
      val b =
        if (i % 2 == 0) { val x = (lonIdx >> li) & 1L; li -= 1; x }
        else { val x = (latIdx >> ti) & 1L; ti -= 1; x }
      code = (code << 1) | b
      i += 1
    }
    code
  }

  private def toBase32(code: Long, precision: Int): String = {
    val sb = new java.lang.StringBuilder(precision)
    var i = precision - 1
    while (i >= 0) {
      sb.append(Alphabet.charAt(((code >> (5 * i)) & 31L).toInt))
      i -= 1
    }
    sb.toString
  }

  /** Geographic bounding box of a geohash cell. Half-open on the
    * upper edges except at the world boundary (lat=90, lon=180
    * belong to the outermost cell because encode clamps). */
  final case class BBox(latMin: Double, latMax: Double,
      lonMin: Double, lonMax: Double) {
    def latCenter: Double = (latMin + latMax) / 2
    def lonCenter: Double = (lonMin + lonMax) / 2
    def latSize: Double = latMax - latMin
    def lonSize: Double = lonMax - lonMin
  }

  /** Decode a geohash string to its bounding box. */
  def bbox(gh: String): BBox = bboxOfCode(cellCode(gh), gh.length)

  /** Bounding box of an integer cell code at `precision`. */
  def bboxOfCode(code: Long, precision: Int): BBox = {
    val nLon = lonBits(precision)
    val nLat = latBits(precision)
    // de-interleave
    var lonIdx = 0L
    var latIdx = 0L
    var i = 0
    val total = nLon + nLat
    while (i < total) {
      val b = (code >> (total - 1 - i)) & 1L
      if (i % 2 == 0) lonIdx = (lonIdx << 1) | b
      else latIdx = (latIdx << 1) | b
      i += 1
    }
    val lonSpan = 360.0 / (1L << nLon)
    val latSpan = 180.0 / (1L << nLat)
    BBox(
      latMin = -90.0 + latIdx * latSpan,
      latMax = -90.0 + (latIdx + 1) * latSpan,
      lonMin = -180.0 + lonIdx * lonSpan,
      lonMax = -180.0 + (lonIdx + 1) * lonSpan)
  }

  /** True iff the point falls in cell `gh` under encode semantics
    * (i.e. encode(lat, lon, gh.length) == gh). */
  def contains(gh: String, lat: Double, lon: Double): Boolean =
    encode(lat, lon, gh.length) == gh.toLowerCase

  /** The neighboring cell in direction (dLat, dLon) ∈ {-1,0,1}².
    * Longitude wraps across the antimeridian; latitude is clamped at
    * the poles (a polar "neighbor" degenerates to the cell itself). */
  def neighbor(gh: String, dLat: Int, dLon: Int): String = {
    val b = bbox(gh)
    var lat = b.latCenter + dLat * b.latSize
    var lon = b.lonCenter + dLon * b.lonSize
    if (lon >= 180.0) lon -= 360.0
    if (lon < -180.0) lon += 360.0
    if (lat > 90.0) lat = b.latCenter
    if (lat < -90.0) lat = b.latCenter
    encode(lat, lon, gh.length)
  }

  /** The 8 adjacent cells (N, NE, E, SE, S, SW, W, NW), excluding
    * the center cell — same contract as the adjacency used by the
    * reference's geofences (GeoUtils.java:28-34). */
  def neighbors8(gh: String): Seq[String] = Seq(
    neighbor(gh, 1, 0), neighbor(gh, 1, 1), neighbor(gh, 0, 1),
    neighbor(gh, -1, 1), neighbor(gh, -1, 0), neighbor(gh, -1, -1),
    neighbor(gh, 0, -1), neighbor(gh, 1, -1))
}
