package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryTransformer
import org.locationtech.jts.geom.CoordinateSequence
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}
import org.locationtech.jts.operation.union.UnaryUnionOp
import org.locationtech.jts.geom.util.GeometryFixer

/**
 * Geometry kernel over JTS (jts-core, public Apache-2 library shipped in
 * /opt/spark/jars). Pure Scala/JVM helpers; Spark-facing Column wrappers
 * live in [[GeoFunctions]].
 *
 * The reference pipeline (see /root/reference) keeps geometries as Shapely
 * objects in EPSG:4326 and reprojects to the equal-area ESRI:54009
 * (World Mollweide) for centroid/area computations
 * (impact_analysis.py:1023,1040-1042). We store WKB bytes in DataFrames and
 * implement the Mollweide forward projection directly (public formula).
 */
object Geo {

  val factory = new GeometryFactory(new PrecisionModel, 4326)

  // --- codecs ------------------------------------------------------------

  def fromWkt(wkt: String): Geometry =
    new WKTReader(factory).read(wkt)

  def toWkt(g: Geometry): String = new WKTWriter().write(g)

  def fromWkb(b: Array[Byte]): Geometry = new WKBReader(factory).read(b)

  def toWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)

  def tryFromWkt(wkt: String): Option[Geometry] =
    try Option(wkt).map(fromWkt) catch { case _: Exception => None }

  // --- constructors ------------------------------------------------------

  def point(lon: Double, lat: Double): Point =
    factory.createPoint(new Coordinate(lon, lat))

  /** Axis-aligned box polygon (lon/lat). */
  def box(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): Polygon = {
    val cs = Array(
      new Coordinate(minLon, minLat), new Coordinate(maxLon, minLat),
      new Coordinate(maxLon, maxLat), new Coordinate(minLon, maxLat),
      new Coordinate(minLon, minLat))
    factory.createPolygon(cs)
  }

  def line(points: Seq[(Double, Double)]): LineString =
    factory.createLineString(points.map { case (x, y) => new Coordinate(x, y) }.toArray)

  // --- Mollweide (ESRI:54009) equal-area projection ----------------------
  // Forward projection on the sphere (public formula). Radius choice is
  // the GEOPANDAS-MATCH decision: the reference runs
  // gdf.to_crs('ESRI:54009').area through pyproj/PROJ, and PROJ evaluates
  // spherical-only projections (moll included) on a sphere of radius a =
  // the ellipsoid's SEMIMAJOR axis (6378137.0 for WGS84), ignoring
  // eccentricity — not the authalic radius (6371007.18) an equal-area
  // purist would pick. We match PROJ so absolute areas line up (the two
  // radii differ by 0.11%, i.e. 0.22% in area). Every reference SEMANTIC
  // built on this area (max-overlap argmax, area>0 flags) is
  // scale-invariant, so the choice is observable only in raw m² outputs.
  // GeoSpec pins the closed-form equal-area golden at this radius.

  private val R = 6378137.0
  private val SqRt2 = math.sqrt(2.0)

  /** Forward Mollweide: (lonDeg, latDeg) -> (x meters, y meters). */
  def mollweideForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    // Solve 2*theta + sin(2*theta) = Pi * sin(lat) by Newton iteration.
    var theta = lat
    var i = 0
    while (i < 25) {
      val f = 2 * theta + math.sin(2 * theta) - math.Pi * math.sin(lat)
      val fp = 2 + 2 * math.cos(2 * theta)
      if (math.abs(fp) < 1e-12) { theta = if (lat > 0) math.Pi / 2 else -math.Pi / 2; i = 25 }
      else {
        val next = theta - f / fp
        if (math.abs(next - theta) < 1e-12) { theta = next; i = 25 }
        else { theta = next; i += 1 }
      }
    }
    val x = R * (2 * SqRt2 / math.Pi) * lon * math.cos(theta)
    val y = R * SqRt2 * math.sin(theta)
    (x, y)
  }

  /** Inverse Mollweide: (x meters, y meters) -> (lonDeg, latDeg) — the
    * closed form (no iteration: θ recovers directly from y):
    * θ = asin(y/(R√2)), φ = asin((2θ + sin 2θ)/π), λ = πx/(2R√2 cos θ).
    * At the poles (cos θ = 0) longitude is indeterminate; 0 is returned.
    * Completes the generic to_crs round trip (SURVEY §2.7's last partial);
    * GeoSpec pins forward∘inverse to sub-centimeter over a world grid. */
  def mollweideInverse(x: Double, y: Double): (Double, Double) = {
    val sinTheta = math.max(-1.0, math.min(1.0, y / (R * SqRt2)))
    val theta = math.asin(sinTheta)
    val sinLat = math.max(-1.0, math.min(1.0,
      (2 * theta + math.sin(2 * theta)) / math.Pi))
    val lat = math.toDegrees(math.asin(sinLat))
    val cosTheta = math.cos(theta)
    val lon =
      if (cosTheta < 1e-12) 0.0
      else math.toDegrees(math.Pi * x / (2 * R * SqRt2 * cosTheta))
    (lon, lat)
  }

  private class MollweideTransformer extends GeometryTransformer {
    override def transformCoordinates(cs: CoordinateSequence, parent: Geometry): CoordinateSequence = {
      val out = new Array[Coordinate](cs.size)
      var i = 0
      while (i < cs.size) {
        val (x, y) = mollweideForward(cs.getX(i), cs.getY(i))
        out(i) = new Coordinate(x, y)
        i += 1
      }
      Geo.factory.getCoordinateSequenceFactory.create(out)
    }
  }

  /** Reproject a lon/lat geometry into Mollweide meters. */
  def toMollweide(g: Geometry): Geometry = new MollweideTransformer().transform(g)

  /** Area in m^2 computed in the equal-area Mollweide projection
    * (reference: gdf.to_crs('ESRI:54009').area, impact_analysis.py:1040-1042). */
  def areaM2(g: Geometry): Double = toMollweide(g).getArea

  /** Centroid computed in the equal-area projection, returned in lon/lat.
    * Mollweide has no closed-form inverse worth maintaining here; instead we
    * compute the area-weighted centroid of the lon/lat rings using the
    * equal-area projected weights only for *selection* purposes. For the
    * reference's use (assigning a tile to the admin polygon containing its
    * centroid, impact_analysis.py:1020-1032) the plain planar centroid of a
    * zoom-14 tile (~2.4 km) differs from the equal-area centroid by far less
    * than a tile width, so planar centroid in lon/lat is semantically
    * equivalent for containment tests. */
  def centroid(g: Geometry): Point = g.getCentroid

  // --- buffer in meters --------------------------------------------------

  private val MetersPerDegLat = 111319.4907932736 // R_wgs84 * Pi / 180 (spherical)

  /**
   * Buffer a lon/lat geometry by `meters` using a local cylindrical scaling
   * about the geometry's centroid latitude: lon is scaled by cos(lat0).
   * Matches the reference semantics of "buffer N meters in a projected CRS"
   * (150 m facility buffer impact_analysis.py:175,1666; 1.5e6 m country
   * buffer main_pipeline.py:185) to well under the tolerance that matters
   * (the 150 m buffer vs 2.4 km tiles; the 1500 km screen is a coarse filter).
   */
  def bufferMeters(g: Geometry, meters: Double): Geometry = {
    val c = g.getCentroid.getCoordinate
    val lat0 = math.toRadians(c.y)
    val cosLat = math.max(math.cos(lat0), 1e-6)
    val fwd = new GeometryTransformer {
      override def transformCoordinates(cs: CoordinateSequence, parent: Geometry): CoordinateSequence = {
        val out = new Array[Coordinate](cs.size)
        var i = 0
        while (i < cs.size) {
          out(i) = new Coordinate(cs.getX(i) * MetersPerDegLat * cosLat, cs.getY(i) * MetersPerDegLat)
          i += 1
        }
        Geo.factory.getCoordinateSequenceFactory.create(out)
      }
    }
    val inv = new GeometryTransformer {
      override def transformCoordinates(cs: CoordinateSequence, parent: Geometry): CoordinateSequence = {
        val out = new Array[Coordinate](cs.size)
        var i = 0
        while (i < cs.size) {
          out(i) = new Coordinate(cs.getX(i) / (MetersPerDegLat * cosLat), cs.getY(i) / MetersPerDegLat)
          i += 1
        }
        Geo.factory.getCoordinateSequenceFactory.create(out)
      }
    }
    inv.transform(fwd.transform(g).buffer(meters))
  }

  /** Approximate great-circle distance in meters between geometry *nearest
    * points* using the local-scaling trick; exact haversine for points.
    * Antimeridian-aware: when the two geometries sit on opposite sides of
    * ±180° (combined lon span > 180), the planar nearest-points search would
    * measure the long way around (+179° to −179° ≈ 358° apart instead of
    * 2°), so the candidate is also evaluated with `b` shifted ±360° and the
    * minimum wins. Haversine itself wraps Δlon correctly either way. */
  def distanceMeters(a: Geometry, b: Geometry): Double = {
    def base(x: Geometry, y: Geometry): Double =
      if (x.isInstanceOf[Point] && y.isInstanceOf[Point]) {
        val pa = x.asInstanceOf[Point]; val pb = y.asInstanceOf[Point]
        haversineMeters(pa.getX, pa.getY, pb.getX, pb.getY)
      } else {
        val co = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(x, y)
        haversineMeters(co(0).x, co(0).y, co(1).x, co(1).y)
      }
    val ea = a.getEnvelopeInternal; val eb = b.getEnvelopeInternal
    val span = math.max(ea.getMaxX, eb.getMaxX) - math.min(ea.getMinX, eb.getMinX)
    if (span <= 180) base(a, b)
    else math.min(base(a, b),
      math.min(base(a, translateLon(b, 360)), base(a, translateLon(b, -360))))
  }

  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * math.pow(math.sin(dLon / 2), 2)
    2 * 6371008.8 * math.asin(math.min(1.0, math.sqrt(a)))
  }

  // --- antimeridian -------------------------------------------------------

  /** Shift longitudes satisfying `pred` by `delta` degrees. */
  private def shiftLons(g: Geometry, pred: Double => Boolean, delta: Double): Geometry = {
    val t = new GeometryTransformer {
      override def transformCoordinates(cs: CoordinateSequence, parent: Geometry): CoordinateSequence = {
        val out = new Array[Coordinate](cs.size)
        var i = 0
        while (i < cs.size) {
          val x = cs.getX(i)
          out(i) = new Coordinate(if (pred(x)) x + delta else x, cs.getY(i))
          i += 1
        }
        Geo.factory.getCoordinateSequenceFactory.create(out)
      }
    }
    t.transform(g)
  }

  /** Rigid longitude translation by `delta` degrees. */
  def translateLon(g: Geometry, delta: Double): Geometry = shiftLons(g, _ => true, delta)

  /** True if the lon bounds span more than a hemisphere — in canonical
    * lon/lat that means dateline-straddling lobes (a Fiji-style country has
    * parts at +179° and −179°, giving a naive span of ~358°), since no
    * actual country/storm footprint is wider than 180°. */
  def spansAntimeridian(g: Geometry): Boolean = {
    val env = g.getEnvelopeInternal
    env.getMaxX - env.getMinX > 180
  }

  /** Make a dateline-straddling geometry contiguous by moving its western
    * (negative-lon) lobes to the [180°, 360°) frame. No-op otherwise. */
  def unwrapAntimeridian(g: Geometry): Geometry =
    if (!spansAntimeridian(g)) g else makeValid(shiftLons(g, _ < 0, 360))

  /**
   * Fold a geometry whose coordinates overflow ±180° back into the
   * canonical frame, splitting it at the antimeridian into a multi-part
   * geometry (the reference detects this case via `bounds[2]-bounds[0] >
   * 180` after buffering, main_pipeline.py:211-214; shapely's buffered
   * output simply runs past ±180 like our cylindrical buffer does).
   * Identity when already canonical.
   */
  def splitAntimeridian(g: Geometry): Geometry = {
    val env = g.getEnvelopeInternal
    if (env.getMinX >= -180 && env.getMaxX <= 180) return g
    val parts = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    val core = g.intersection(box(-180, -90, 180, 90))
    if (!core.isEmpty) parts += core
    if (env.getMaxX > 180) {
      val east = g.intersection(box(180, -90, env.getMaxX, 90))
      if (!east.isEmpty) parts += translateLon(east, -360)
    }
    if (env.getMinX < -180) {
      val west = g.intersection(box(env.getMinX, -90, -180, 90))
      if (!west.isEmpty) parts += translateLon(west, 360)
    }
    makeValid(unionAll(parts))
  }

  /** [[bufferMeters]] with dateline handling: unwrap a straddling input to a
    * contiguous frame, buffer there, fold the overflow back. Exactly
    * [[bufferMeters]] for geometries that stay inside ±180°. */
  def bufferMetersDateline(g: Geometry, meters: Double): Geometry =
    splitAntimeridian(bufferMeters(unwrapAntimeridian(g), meters))

  // --- repair / union ----------------------------------------------------

  /** `make_valid` analogue (main_pipeline.py:192-207 uses make_valid else buffer(0)). */
  def makeValid(g: Geometry): Geometry =
    if (g.isValid) g else GeometryFixer.fix(g)

  /** Cascaded union (reference union_all / ST_UNION_AGG,
    * impact_analysis.py:1158, snowflake_utils.py:603). */
  def unionAll(gs: Iterable[Geometry]): Geometry =
    if (gs.isEmpty) factory.createGeometryCollection()
    else UnaryUnionOp.union(scala.jdk.CollectionConverters.IterableHasAsJava(gs).asJavaCollection)
}
