package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class QuadkeySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  test("known quadkey example from the Bing tile scheme") {
    // tile (3,5) zoom 3 -> quadkey "213" (published example)
    assert(Quadkey.tileXYToQuadkey(3, 5, 3) == "213")
    assert(Quadkey.quadkeyToTileXY("213") == ((3, 5, 3)))
  }

  test("roundtrip tileXY <-> quadkey at zoom 14 (randomized)") {
    val n = 1 << 14
    (1 to 500).foreach { _ =>
      val x = rng.nextInt(n); val y = rng.nextInt(n)
      assert(Quadkey.quadkeyToTileXY(Quadkey.tileXYToQuadkey(x, y, 14)) == ((x, y, 14)))
    }
  }

  test("lonlat -> quadkey -> polygon contains the point (randomized)") {
    (1 to 500).foreach { _ =>
      val lon = rng.nextDouble() * 359.8 - 179.9
      val lat = rng.nextDouble() * 168.0 - 84.0
      val qk = Quadkey.quadkeyForLonLat(lon, lat, 14)
      val (minLon, minLat, maxLon, maxLat) = Quadkey.quadkeyBounds(qk)
      assert(qk.length == 14)
      assert(lon >= minLon - 1e-9 && lon <= maxLon + 1e-9, s"$lon not in [$minLon,$maxLon]")
      assert(lat >= minLat - 1e-6 && lat <= maxLat + 1e-6, s"$lat not in [$minLat,$maxLat]")
    }
  }

  test("quadkey prefix = ancestor tile (spatial partitioning key)") {
    val qk = Quadkey.quadkeyForLonLat(-72.3, 18.7, 14)
    val parent = qk.substring(0, 10)
    val (pMinLon, pMinLat, pMaxLon, pMaxLat) = Quadkey.quadkeyBounds(parent)
    val (cMinLon, cMinLat, cMaxLon, cMaxLat) = Quadkey.quadkeyBounds(qk)
    assert(cMinLon >= pMinLon - 1e-12 && cMaxLon <= pMaxLon + 1e-12)
    assert(cMinLat >= pMinLat - 1e-12 && cMaxLat <= pMaxLat + 1e-12)
  }

  test("cover returns all tiles intersecting a bbox") {
    val cells = Quadkey.cover(-72.1, 18.4, -71.9, 18.6, 10)
    assert(cells.nonEmpty)
    cells.foreach { qk =>
      val (a, b, c, d) = Quadkey.quadkeyBounds(qk)
      assert(a <= -71.9 + 1e-9 && c >= -72.1 - 1e-9 && b <= 18.6 + 1e-9 && d >= 18.4 - 1e-9)
    }
    assert(cells.contains(Quadkey.quadkeyForLonLat(-72.05, 18.45, 10)))
  }
}
