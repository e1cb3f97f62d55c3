package graft.ops

import graft.SparkSpec
import graft.geo.Geo
import org.apache.spark.sql.functions._

/** Extended track scan (S3): wire decode, wind-field construction from
  * quadrant radii, radii summary (ref snowflake_utils.py:333-388). */
class TracksSpec extends SparkSpec {

  import spark.implicits._

  test("decodeExtendedTracks lowercases wire columns, parses WKT, pads missing radii") {
    val raw = Seq(
      (1, 10.0, 20.0, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", Some(120.0)),
      (2, 11.0, 21.0, "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))", None))
      .toDF("ENSEMBLE_MEMBER", "LONGITUDE", "LATITUDE",
        "WIND_FIELD_POLYGON_34KT", "RADIUS_34_KNOT_WINDS_NE_KM")
    val out = Tracks.decodeExtendedTracks(raw)
    assert(out.columns.contains("ensemble_member"))
    // WKT became WKB geometry
    val poly = Geo.fromWkb(out.orderBy("ensemble_member")
      .select("wind_field_polygon_34kt").head().getAs[Array[Byte]](0))
    assert(poly.getArea == 1.0)
    // absent radius columns padded as null doubles — full stable schema
    Tracks.RadiusCols.foreach(c => assert(out.columns.contains(c), c))
    assert(out.filter(col("radius_50_knot_winds_ne_km").isNotNull).count() == 0)
  }

  test("windFieldPolygon: quadrant-arc geometry contains/excludes the right points") {
    val lon = -72.0; val lat = 18.5
    val df = Seq((lon, lat, 100.0, 50.0, 25.0, 75.0))
      .toDF("lon", "lat", "ne", "se", "sw", "nw")
      .withColumn("wf", Tracks.windFieldPolygon(
        col("lon"), col("lat"), col("ne"), col("se"), col("sw"), col("nw")))
    val poly = Geo.fromWkb(df.select("wf").head().getAs[Array[Byte]](0))
    assert(poly.isValid)

    val latScale = 111320.0
    val lonScale = 111320.0 * math.cos(math.toRadians(lat))
    def pointAt(bearingDeg: Double, rKm: Double) = Geo.point(
      lon + rKm * 1000 * math.sin(math.toRadians(bearingDeg)) / lonScale,
      lat + rKm * 1000 * math.cos(math.toRadians(bearingDeg)) / latScale)

    // mid-quadrant probes: inside at 0.9r, outside at 1.1r
    val quadrantRadii = Seq(45.0 -> 100.0, 135.0 -> 50.0, 225.0 -> 25.0, 315.0 -> 75.0)
    quadrantRadii.foreach { case (bearing, r) =>
      assert(poly.contains(pointAt(bearing, r * 0.9)), s"expected inside at $bearing")
      assert(!poly.contains(pointAt(bearing, r * 1.1)), s"expected outside at $bearing")
    }
    // centre inside when all quadrants have extent
    assert(poly.contains(Geo.point(lon, lat)))
  }

  test("windFieldPolygon: zero/null quadrants degenerate safely; all-zero is null") {
    val rows = Seq(
      ("half", Some(100.0), Option.empty[Double], Some(100.0), Option.empty[Double]),
      ("none", Option.empty[Double], Option.empty[Double], Option.empty[Double], Option.empty[Double]))
      .toDF("name", "ne", "se", "sw", "nw")
      .withColumn("wf", Tracks.windFieldPolygon(
        lit(-72.0), lit(18.5), col("ne"), col("se"), col("sw"), col("nw")))
    val byName = rows.select("name", "wf").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(byName("none") == null)
    val half = Geo.fromWkb(byName("half"))
    assert(half.isValid) // self-touching wedges repaired
    assert(half.getArea > 0)
  }

  test("withWindFields + radiiSummary over a synthetic extended scan") {
    val base = Seq(
      // member, lon, lat, then 34kt radii (complete), 50kt (one quadrant 0), 64kt (absent)
      (1, -72.0, 18.5, 90.0, 80.0, 70.0, 60.0, 40.0, 0.0, 30.0, 20.0),
      (2, -72.1, 18.6, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("ensemble_member", "longitude", "latitude",
        "radius_34_knot_winds_ne_km", "radius_34_knot_winds_se_km",
        "radius_34_knot_winds_sw_km", "radius_34_knot_winds_nw_km",
        "radius_50_knot_winds_ne_km", "radius_50_knot_winds_se_km",
        "radius_50_knot_winds_sw_km", "radius_50_knot_winds_nw_km")
    val wf = Tracks.withWindFields(base)
    assert(wf.columns.contains("wind_field_polygon_34kt"))
    assert(wf.columns.contains("wind_field_polygon_50kt"))
    assert(!wf.columns.contains("wind_field_polygon_64kt")) // radii absent -> skipped
    val rows = wf.orderBy("ensemble_member").collect()
    assert(rows(0).getAs[Array[Byte]]("wind_field_polygon_34kt") != null)
    assert(rows(1).getAs[Array[Byte]]("wind_field_polygon_34kt") == null) // all-zero

    val summary = Tracks.radiiSummary(Tracks.decodeExtendedTracks(base))
      .orderBy("ensemble_member").collect()
    assert(summary(0).getAs[Boolean]("complete_34kt"))
    assert(!summary(0).getAs[Boolean]("complete_50kt")) // one quadrant is 0
    assert(!summary(0).getAs[Boolean]("complete_64kt")) // padded nulls
    assert(summary(0).getAs[Double]("max_radius_km") == 90.0)
    assert(summary(1).getAs[Double]("max_radius_km") == 0.0)
  }
}
