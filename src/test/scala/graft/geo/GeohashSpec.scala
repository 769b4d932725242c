package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  private def randomPoints(n: Int): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { _ =>
      (rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
    }
  }

  /** Independent reference implementation: classic midpoint-bisection
    * geohash (as published, e.g., on the geohash Wikipedia page).
    * Used to cross-validate the index-formula implementation. */
  private def bisectionEncode(lat: Double, lon: Double,
      precision: Int): String = {
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    val sb = new StringBuilder
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonMin = mid }
        else { ch = ch << 1; lonMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latMin = mid }
        else { ch = ch << 1; latMax = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Geohash.Alphabet.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  test("golden vectors (published examples)") {
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(42.605, -5.603, 5) == "ezs42")
    assert(Geohash.encode(0.0, 0.0, 1) == "s")
    assert(Geohash.encode(90.0, 180.0, 1) == "z")
    assert(Geohash.encode(-90.0, -180.0, 1) == "0")
  }

  test("matches independent bisection implementation") {
    randomPoints(500).zipWithIndex.foreach { case ((lat, lon), i) =>
      val p = i % 12 + 1
      assert(Geohash.encode(lat, lon, p) == bisectionEncode(lat, lon, p),
        s"($lat, $lon, $p)")
    }
  }

  test("prefix monotonicity: longer precision extends shorter") {
    randomPoints(200).foreach { case (lat, lon) =>
      val g12 = Geohash.encode(lat, lon, 12)
      (1 to 11).foreach { p =>
        assert(Geohash.encode(lat, lon, p) == g12.take(p))
      }
    }
  }

  test("bbox round-trip: center re-encodes to same cell") {
    randomPoints(200).zipWithIndex.foreach { case ((lat, lon), i) =>
      val p = i % 10 + 1
      val gh = Geohash.encode(lat, lon, p)
      val b = Geohash.bbox(gh)
      assert(Geohash.encode(b.latCenter, b.lonCenter, p) == gh)
      assert(lat >= b.latMin && lat < b.latMax || lat == 90.0)
      assert(lon >= b.lonMin && lon < b.lonMax || lon == 180.0)
    }
  }

  test("neighbor symmetry: E then W returns to start") {
    Seq("dr72", "dr5x0z", "dr5rzjx", "u4pru", "ezs42").foreach { g =>
      assert(Geohash.neighbor(Geohash.neighbor(g, 0, 1), 0, -1) == g)
      assert(Geohash.neighbor(Geohash.neighbor(g, 1, 0), -1, 0) == g)
    }
  }

  test("neighbors8 excludes center, all distinct, all adjacent") {
    Seq("dr72", "dr5x0z", "dr5rzjx").foreach { g =>
      val n = Geohash.neighbors8(g)
      assert(n.size == 8)
      assert(n.distinct.size == 8)
      assert(!n.contains(g))
      val b = Geohash.bbox(g)
      n.foreach { x =>
        val nb = Geohash.bbox(x)
        // shares an edge or corner with the center cell
        val eps = 1e-9
        assert(math.abs(nb.latMin - b.latMax) < eps ||
          math.abs(nb.latMax - b.latMin) < eps ||
          math.abs(nb.latMin - b.latMin) < eps)
      }
    }
  }

  test("contains = encode-prefix semantics") {
    val b = Geohash.bbox("dr72")
    assert(Geohash.contains("dr72", b.latCenter, b.lonCenter))
    assert(!Geohash.contains("dr72", b.latCenter + b.latSize, b.lonCenter))
    // lower edge is inside, upper edge belongs to the next cell
    assert(Geohash.contains("dr72", b.latMin, b.lonMin))
    assert(!Geohash.contains("dr72", b.latMax, b.lonMin))
  }

  test("geofence cell lists have expected shape") {
    assert(Geofences.nycCells.size == 8)
    assert(Geofences.nycCells.forall(_.length == 4))
    assert(!Geofences.nycCells.contains("dr72"))
    assert(Geofences.jfkCells.size == 8)
    assert(Geofences.jfkCells.forall(_.length == 6))
    assert(Geofences.lgaCells.size == 10)
    assert(Geofences.lgaCells.take(2) == Seq("dr5ryy", "dr5rzn"))
    assert(Geofences.lgaCells.drop(2).forall(_.length == 7))
  }

  test("fence membership: center of each cell is in fence") {
    Geofences.nycCells.foreach { c =>
      val b = Geohash.bbox(c)
      assert(Geofences.nearNYC(b.latCenter, b.lonCenter))
    }
    val dr72 = Geohash.bbox("dr72")
    // center cell dr72 itself is NOT part of the NYC fence
    assert(!Geofences.nearNYC(dr72.latCenter, dr72.lonCenter))
    Geofences.jfkCells.foreach { c =>
      val b = Geohash.bbox(c)
      assert(Geofences.nearJFK(b.latCenter, b.lonCenter))
      // JFK cells are inside greater-NYC? not necessarily — just sanity:
      assert(c.startsWith("dr5") || c.startsWith("dr7"))
    }
  }

  test("validCoords edge cases") {
    assert(Geofences.validCoords(90.0, 180.0))
    assert(Geofences.validCoords(-90.0, -180.0))
    assert(!Geofences.validCoords(90.0001, 0.0))
    assert(!Geofences.validCoords(0.0, -180.5))
    assert(!Geofences.validCoords(Double.NaN, 0.0))
    assert(!Geofences.validCoords(0.0, Double.NaN))
  }
}
