package graft.geo

import org.locationtech.jts.geom.Polygon

/**
 * Web-Mercator quadkey codec (Bing tile scheme, public formulas from the
 * Bing Maps Tile System documentation). The reference keys its base layer by
 * zoom-14 quadkey strings (`tile_id`, e.g. "31100123111112" —
 * custom_data/README.md:166, impact_analysis.py:770-974).
 *
 * Quadkey prefixes are spatially hierarchical: tiles sharing a prefix share
 * an ancestor tile. At 100 TB scale this gives the engine a free spatial
 * partitioning key (partition/bucket tiles by `substring(tile_id, 0, k)`) and
 * a filter-refine equi-join key for spatial joins.
 */
object Quadkey {

  private val MaxLat = 85.05112878

  def clip(v: Double, lo: Double, hi: Double): Double = math.min(math.max(v, lo), hi)

  /** lon/lat -> tile xy at zoom. */
  def lonLatToTileXY(lon: Double, lat: Double, zoom: Int): (Int, Int) = {
    val lat2 = clip(lat, -MaxLat, MaxLat)
    val x = (lon + 180.0) / 360.0
    val sinLat = math.sin(math.toRadians(lat2))
    val y = 0.5 - math.log((1 + sinLat) / (1 - sinLat)) / (4 * math.Pi)
    val mapSize = 1 << zoom
    val tx = clip(math.floor(x * mapSize), 0, mapSize - 1).toInt
    val ty = clip(math.floor(y * mapSize), 0, mapSize - 1).toInt
    (tx, ty)
  }

  def tileXYToQuadkey(tx: Int, ty: Int, zoom: Int): String = {
    val sb = new StringBuilder
    var i = zoom
    while (i > 0) {
      var digit = 0
      val mask = 1 << (i - 1)
      if ((tx & mask) != 0) digit += 1
      if ((ty & mask) != 0) digit += 2
      sb.append(digit)
      i -= 1
    }
    sb.toString
  }

  def quadkeyToTileXY(qk: String): (Int, Int, Int) = {
    var tx = 0; var ty = 0
    val zoom = qk.length
    var i = zoom
    var j = 0
    while (i > 0) {
      val mask = 1 << (i - 1)
      qk.charAt(j) match {
        case '0' =>
        case '1' => tx |= mask
        case '2' => ty |= mask
        case '3' => tx |= mask; ty |= mask
        case c   => throw new IllegalArgumentException(s"bad quadkey digit '$c' in $qk")
      }
      i -= 1; j += 1
    }
    (tx, ty, zoom)
  }

  def quadkeyForLonLat(lon: Double, lat: Double, zoom: Int): String = {
    val (tx, ty) = lonLatToTileXY(lon, lat, zoom)
    tileXYToQuadkey(tx, ty, zoom)
  }

  /** Tile bounds in lon/lat: (minLon, minLat, maxLon, maxLat). */
  def tileBounds(tx: Int, ty: Int, zoom: Int): (Double, Double, Double, Double) = {
    val mapSize = (1 << zoom).toDouble
    def lonOf(x: Int): Double = x / mapSize * 360.0 - 180.0
    def latOf(y: Int): Double = {
      val n = math.Pi - 2.0 * math.Pi * y / mapSize
      math.toDegrees(math.atan(math.sinh(n)))
    }
    (lonOf(tx), latOf(ty + 1), lonOf(tx + 1), latOf(ty))
  }

  def quadkeyBounds(qk: String): (Double, Double, Double, Double) = {
    val (tx, ty, z) = quadkeyToTileXY(qk)
    tileBounds(tx, ty, z)
  }

  def quadkeyPolygon(qk: String): Polygon = {
    val (minLon, minLat, maxLon, maxLat) = quadkeyBounds(qk)
    Geo.box(minLon, minLat, maxLon, maxLat)
  }

  /** All quadkeys at `zoom` whose tiles intersect the lon/lat bbox.
    * This is the tile-universe generator (reference MercatorViewGenerator,
    * impact_analysis.py:808) and the candidate-cell generator for
    * filter-refine spatial joins: cover a query geometry's envelope with
    * cells, equi-join on cell, refine with the exact predicate. */
  def cover(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double, zoom: Int): Seq[String] = {
    val (x0, y1) = lonLatToTileXY(minLon, minLat, zoom) // y grows southward
    val (x1, y0) = lonLatToTileXY(maxLon, maxLat, zoom)
    for (tx <- x0 to x1; ty <- y0 to y1) yield tileXYToQuadkey(tx, ty, zoom)
  }
}
