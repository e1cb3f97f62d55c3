package graft.ops

import graft.SparkSpec
import graft.geo.Geo
import org.apache.spark.sql.functions._

class GeoAggregatesSpec extends SparkSpec {

  import spark.implicits._

  test("st_union_agg: union of overlapping boxes has the right area") {
    val df = Seq(
      Geo.toWkb(Geo.box(0, 0, 2, 2)),
      Geo.toWkb(Geo.box(1, 1, 3, 3)),
      Geo.toWkb(Geo.box(10, 10, 11, 11))).toDF("geometry")
    val u = df.agg(GeoAggregates.st_union_agg($"geometry")).head().getAs[Array[Byte]](0)
    assert(math.abs(Geo.fromWkb(u).getArea - 8.0) < 1e-9) // 7 + 1
  }

  test("st_union_agg over many partitions (partial aggregation path)") {
    val boxes = (0 until 200).map(i => Geo.toWkb(Geo.box(i, 0, i + 1, 1)))
    val u = boxes.toDF("geometry").repartition(8)
      .agg(GeoAggregates.st_union_agg($"geometry")).head().getAs[Array[Byte]](0)
    assert(math.abs(Geo.fromWkb(u).getArea - 200.0) < 1e-9)
  }

  test("countriesInRange screens by distance to the envelope union (J7)") {
    val envs = Seq(Geo.toWkb(Geo.box(0, 0, 1, 1))).toDF("geometry")
    val countries = Seq(
      ("NEAR", Geo.toWkb(Geo.box(1.5, 0, 2.5, 1))),   // ~55 km east
      ("FAR", Geo.toWkb(Geo.box(40, 0, 41, 1)))        // ~4300 km east
    ).toDF("iso3", "geometry")
    val out = GeoAggregates.countriesInRange(countries, "geometry", envs, "geometry",
      meters = 1.5e6).select("iso3").as[String].collect().toSet
    assert(out == Set("NEAR"))
  }

  test("buffer-intersects fallback (J8) agrees on the same screen") {
    val envs = Seq(Geo.toWkb(Geo.box(0, 0, 1, 1))).toDF("geometry")
    assert(GeoAggregates.countryIntersectsBuffered(
      Geo.toWkb(Geo.box(1.5, 0, 2.5, 1)), envs, "geometry", 1.5e6))
    assert(!GeoAggregates.countryIntersectsBuffered(
      Geo.toWkb(Geo.box(40, 0, 41, 1)), envs, "geometry", 1.5e6))
  }

  test("J7 + J8 screens find a dateline-straddling country from the far side") {
    // envelope just west of the seam; Fiji-style country with lobes at +179/-179
    val envs = Seq(Geo.toWkb(Geo.box(-179.4, -18.0, -178.9, -17.0))).toDF("geometry")
    val fiji = Geo.toWkb(Geo.unionAll(Seq(
      Geo.box(178.0, -19.0, 179.2, -16.0),
      Geo.box(-180.0, -19.0, -178.5, -16.0))))
    // J8: the 150 km buffer folds across ±180 and reaches the envelope
    assert(GeoAggregates.countryIntersectsBuffered(fiji, envs, "geometry", 1.5e5))
    // J7: distance measured across the seam, not the long way round
    val countries = Seq(("FJI", fiji)).toDF("iso3", "geometry")
    val out = GeoAggregates.countriesInRange(countries, "geometry", envs, "geometry",
      meters = 1.5e5).select("iso3").as[String].collect().toSet
    assert(out == Set("FJI"))
    // and the east-lobe-only country 0.8 degrees from the seam still screens
    // out at a 10 km radius (no false positive from the wrap logic)
    assert(!GeoAggregates.countryIntersectsBuffered(
      Geo.toWkb(Geo.box(178.0, -19.0, 179.2, -16.0)), envs, "geometry", 1.0e4))
  }

  test("linesFromPoints emits n-1 segments per member with first-point attrs (W4)") {
    val pts = Seq(
      (1, 0, Geo.toWkb(Geo.point(0, 0))), (1, 1, Geo.toWkb(Geo.point(1, 0))),
      (1, 2, Geo.toWkb(Geo.point(1, 1))), (2, 0, Geo.toWkb(Geo.point(5, 5)))
    ).toDF("member", "seq", "geometry")
    val lines = GeoAggregates.linesFromPoints(pts, Seq("member"), "seq")
    assert(lines.count() == 2) // member 1: 2 segments; member 2: none
    val first = lines.orderBy("seq").head()
    assert(first.getAs[Int]("seq") == 0)
    val g = Geo.fromWkb(first.getAs[Array[Byte]]("geometry"))
    assert(g.getGeometryType == "LineString" && g.getLength == 1.0)
  }
}
