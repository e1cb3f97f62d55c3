package graft.ops

import graft.geo.Geo
import graft.geo.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Extended track scan (S3; reference snowflake_utils.py:333-388): per track
 * point, the 34/50/64 kt wind radii by quadrant (NE/SE/SW/NW) plus the
 * radius of maximum winds, and per-point wind-field polygons per threshold.
 *
 * The reference reads the polygons pre-computed from its warehouse
 * (`ST_ASWKT(WIND_FIELD_POLYGON_34KT)`); here the scan decodes them when the
 * wire carries WKT, and [[withWindFields]] CONSTRUCTS them from the quadrant
 * radii when it doesn't — the standard quadrant-arc construction used for
 * forecast wind fields (each quadrant an arc at its radius, stitched at the
 * quadrant boundaries, degenerating to the centre where a radius is 0).
 *
 * Scale shape: both the decode and the construction are narrow per-row maps
 * over the track table — no shuffle, partitionable by (storm, member).
 */
object Tracks {

  val Thresholds: Seq[Int] = Seq(34, 50, 64)
  val Quadrants: Seq[String] = Seq("ne", "se", "sw", "nw")

  /** The 12 quadrant-radius columns + radius of maximum winds, wire order. */
  val RadiusCols: Seq[String] =
    "radius_of_maximum_winds_km" +:
      (for (kt <- Thresholds; q <- Quadrants) yield s"radius_${kt}_knot_winds_${q}_km")

  def radiusCol(kt: Int, quadrant: String): String = s"radius_${kt}_knot_winds_${quadrant}_km"

  /**
   * Wire decode (S7-style): uppercase wire columns → lowercase; any
   * `wind_field_polygon_*` WKT column → WKB geometry. Missing radius columns
   * are added as null doubles so downstream code sees a stable schema.
   */
  def decodeExtendedTracks(raw: DataFrame): DataFrame = {
    val lowered = raw.columns.foldLeft(raw) { (d, c) => d.withColumnRenamed(c, c.toLowerCase) }
    val withPolys = lowered.columns.filter(_.startsWith("wind_field_polygon_"))
      .foldLeft(lowered) { (d, c) => d.withColumn(c, st_geomFromWKT(col(c))) }
    RadiusCols.foldLeft(withPolys) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("double"))
    }
  }

  /** Metres per degree of latitude (spherical mean radius). */
  private val MetersPerDegree = 111320.0

  private val windFieldUdf = udf {
    (lon: java.lang.Double, lat: java.lang.Double,
     ne: java.lang.Double, se: java.lang.Double,
     sw: java.lang.Double, nw: java.lang.Double) =>
      if (lon == null || lat == null) null
      else {
        def r(x: java.lang.Double): Double = if (x == null || x < 0) 0.0 else x.doubleValue()
        val radii = Array(r(ne), r(se), r(sw), r(nw)) // bearings [0,90),[90,180),[180,270),[270,360)
        if (radii.forall(_ == 0.0)) null
        else {
          val latScale = MetersPerDegree
          val lonScale = MetersPerDegree * math.max(math.cos(math.toRadians(lat)), 1e-6)
          // 5° arc steps: 72 vertices + closing point; each bearing takes its
          // quadrant's radius, so the ring passes through the centre for
          // zero-radius quadrants (degenerate wedge)
          val coords = (0 to 72).map { i =>
            val bearingDeg = (i % 72) * 5.0
            val rKm = radii((bearingDeg / 90.0).toInt)
            val b = math.toRadians(bearingDeg)
            new org.locationtech.jts.geom.Coordinate(
              lon + rKm * 1000.0 * math.sin(b) / lonScale,
              lat + rKm * 1000.0 * math.cos(b) / latScale)
          }
          val ring = Geo.factory.createLinearRing(coords.toArray)
          val poly = Geo.factory.createPolygon(ring)
          // a quadrant mix like (r, 0, r, 0) self-touches at the centre;
          // buffer(0) via makeValid keeps it a valid (multi)polygon
          Geo.toWkb(if (poly.isValid) poly else Geo.makeValid(poly))
        }
      }
  }

  /** Wind-field polygon (WKB) from per-quadrant radii in km; null when every
    * radius is null/0 (no wind extent at this threshold). */
  def windFieldPolygon(lon: Column, lat: Column,
                       ne: Column, se: Column, sw: Column, nw: Column): Column =
    windFieldUdf(lon, lat, ne, se, sw, nw)

  /** Add `wind_field_polygon_{34,50,64}kt` columns built from the quadrant
    * radii (skips thresholds whose radius columns are absent). */
  def withWindFields(df: DataFrame,
                     lonCol: String = "longitude", latCol: String = "latitude"): DataFrame =
    Thresholds.filter(kt => Quadrants.forall(q => df.columns.contains(radiusCol(kt, q))))
      .foldLeft(df) { (d, kt) =>
        d.withColumn(s"wind_field_polygon_${kt}kt",
          windFieldPolygon(col(lonCol), col(latCol),
            col(radiusCol(kt, "ne")), col(radiusCol(kt, "se")),
            col(radiusCol(kt, "sw")), col(radiusCol(kt, "nw"))))
      }

  /**
   * Radii completeness + extent summary per point — the scan-side shape of
   * the reference's extended query (which thresholds carry a full quadrant
   * set, and the maximum radial extent). Pure codegen'd arithmetic.
   */
  def radiiSummary(df: DataFrame): DataFrame = {
    def complete(kt: Int): Column =
      Quadrants.map(q => col(radiusCol(kt, q)).isNotNull && col(radiusCol(kt, q)) > 0)
        .reduce(_ && _)
    val allRadii = for (kt <- Thresholds; q <- Quadrants) yield
      coalesce(col(radiusCol(kt, q)), lit(0.0))
    Thresholds.foldLeft(df) { (d, kt) =>
      d.withColumn(s"complete_${kt}kt", complete(kt))
    }.withColumn("max_radius_km", greatest(allRadii: _*))
  }
}
