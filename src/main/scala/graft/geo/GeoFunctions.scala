package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry

/**
 * Spark-facing `ST_*` function family (SURVEY.md §2.7 "Geometry scalars").
 * Geometries travel through DataFrames as WKB `BinaryType` columns; WKT only
 * at the ingest/egress edges (the reference's wire format is WKT from
 * Snowflake ST_ASWKT, snowflake_utils.py:380-382,421).
 *
 * v0 = Scala UDFs (null-safe). The hot predicates used in the broadcast
 * spatial join path deliberately do NOT go through these Column wrappers —
 * see graft.ops.SpatialJoin, which prepares JTS objects once per broadcast
 * side and uses prepared-geometry evaluation inside a single UDF, which is
 * far cheaper than re-deserializing WKB per row pair.
 */
object GeoFunctions {

  @inline private def g(b: Array[Byte]): Geometry = Geo.fromWkb(b)

  // constructors / codecs
  val stGeomFromWkt = udf((wkt: String) => Geo.tryFromWkt(wkt).map(Geo.toWkb).orNull)
  val stAsWkt       = udf((b: Array[Byte]) => if (b == null) null else Geo.toWkt(g(b)))
  val stPoint       = udf((lon: java.lang.Double, lat: java.lang.Double) =>
    if (lon == null || lat == null) null else Geo.toWkb(Geo.point(lon, lat)))
  val stQuadkeyPolygon = udf((qk: String) =>
    if (qk == null) null else Geo.toWkb(Quadkey.quadkeyPolygon(qk)))
  val stBox = udf((minLon: java.lang.Double, minLat: java.lang.Double,
                   maxLon: java.lang.Double, maxLat: java.lang.Double) =>
    if (minLon == null || minLat == null || maxLon == null || maxLat == null) null
    else Geo.toWkb(Geo.box(minLon, minLat, maxLon, maxLat)))

  // predicates
  val stIntersects = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null else java.lang.Boolean.valueOf(g(a).intersects(g(b))))
  val stWithin = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null else java.lang.Boolean.valueOf(g(a).within(g(b))))
  val stContains = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null else java.lang.Boolean.valueOf(g(a).contains(g(b))))
  val stDWithinMeters = udf((a: Array[Byte], b: Array[Byte], m: java.lang.Double) =>
    if (a == null || b == null || m == null) null
    else java.lang.Boolean.valueOf(Geo.distanceMeters(g(a), g(b)) <= m))

  // measures / transforms
  val stAreaM2 = udf((b: Array[Byte]) =>
    if (b == null) null else java.lang.Double.valueOf(Geo.areaM2(g(b))))
  val stCentroid = udf((b: Array[Byte]) => if (b == null) null else Geo.toWkb(Geo.centroid(g(b))))
  val stBufferMeters = udf((b: Array[Byte], m: java.lang.Double) =>
    if (b == null || m == null) null else Geo.toWkb(Geo.bufferMeters(g(b), m)))
  val stMakeValid = udf((b: Array[Byte]) => if (b == null) null else Geo.toWkb(Geo.makeValid(g(b))))
  val stIntersection = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null else Geo.toWkb(g(a).intersection(g(b))))
  val stDistanceMeters = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null else java.lang.Double.valueOf(Geo.distanceMeters(g(a), g(b))))
  val stX = udf((b: Array[Byte]) =>
    if (b == null) null else java.lang.Double.valueOf(g(b).getCoordinate.x))
  val stY = udf((b: Array[Byte]) =>
    if (b == null) null else java.lang.Double.valueOf(g(b).getCoordinate.y))
  val stMakeLine = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else Geo.toWkb(Geo.line(Seq((g(a).getCoordinate.x, g(a).getCoordinate.y),
                                (g(b).getCoordinate.x, g(b).getCoordinate.y)))))

  // quadkey helpers (pure arithmetic — no geometry deserialization)
  val quadkeyOf = udf((lon: java.lang.Double, lat: java.lang.Double, zoom: Int) =>
    if (lon == null || lat == null) null else Quadkey.quadkeyForLonLat(lon, lat, zoom))

  /** Column sugar. */
  def st_geomFromWKT(c: Column): Column = stGeomFromWkt(c)
  def st_asWKT(c: Column): Column = stAsWkt(c)
  def st_point(lon: Column, lat: Column): Column = stPoint(lon, lat)
  def st_intersects(a: Column, b: Column): Column = stIntersects(a, b)
  def st_within(a: Column, b: Column): Column = stWithin(a, b)
  def st_contains(a: Column, b: Column): Column = stContains(a, b)
  def st_dwithin_m(a: Column, b: Column, m: Column): Column = stDWithinMeters(a, b, m)
  def st_area_m2(c: Column): Column = stAreaM2(c)
  def st_centroid(c: Column): Column = stCentroid(c)
  def st_buffer_m(c: Column, m: Column): Column = stBufferMeters(c, m)
  def st_make_valid(c: Column): Column = stMakeValid(c)
  def st_intersection(a: Column, b: Column): Column = stIntersection(a, b)
  def st_distance_m(a: Column, b: Column): Column = stDistanceMeters(a, b)
  def st_x(c: Column): Column = stX(c)
  def st_y(c: Column): Column = stY(c)
  def st_quadkey(lon: Column, lat: Column, zoom: Column): Column = quadkeyOf(lon, lat, zoom)
  def st_box(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column): Column =
    stBox(minLon, minLat, maxLon, maxLat)
  def st_make_line(a: Column, b: Column): Column = stMakeLine(a, b)
  def st_quadkey_polygon(qk: Column): Column = stQuadkeyPolygon(qk)
}
