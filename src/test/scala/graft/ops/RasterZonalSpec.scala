package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S12 zonal ingestion semantics: quadkey assignment, one-pass band sums
  * with NULL (not 0) empty bands, modal class tie-break, point count/mean,
  * and the base-layer NaN-fallback assembly. */
class RasterZonalSpec extends SparkSpec {
  import spark.implicits._

  // two zoom-1 tiles: (10,10) is in the NE quadrant "1"; (-10,10) in NW "0"
  private def cells = Seq(
    (10.0, 10.0, 5, 100L, 11),  // lon, lat, band, v, smod
    (10.0, 10.0, 12, 50L, 11),
    (10.0, 10.0, 15, 25L, 30),
    (-10.0, 10.0, 3, 7L, 21)
  ).toDF("lon", "lat", "band", "v", "smod")

  test("ageBandSums: one aggregation, NULL for empty bands, total population") {
    val out = RasterZonal.ageBandSums(cells, "lon", "lat", "band", "v", 1,
      Seq(("school", 5, 14), ("infant", 0, 1), ("adolescent", 15, 15)))
      .orderBy("tile_id").collect()
    assert(out.length == 2)
    val nw = out(0); val ne = out(1)
    assert(nw.getString(0) == "0" && ne.getString(0) == "1")
    assert(ne.getAs[Long]("school") == 150L)
    assert(ne.isNullAt(ne.fieldIndex("infant"))) // no 0-1 band cells: NULL, not 0
    assert(ne.getAs[Long]("adolescent") == 25L)
    assert(ne.getAs[Long]("population") == 175L)
    assert(nw.isNullAt(nw.fieldIndex("school")) && nw.getAs[Long]("population") == 7L)
  }

  test("zonalModal: majority wins; count tie breaks to the higher class") {
    val m = RasterZonal.zonalModal(cells, "lon", "lat", "smod", 1, "smod_class")
      .orderBy("tile_id").collect()
    assert(m(1).getAs[Int]("smod_class") == 11) // 2×11 beats 1×30
    val tied = Seq((10.0, 10.0, 12), (10.0, 10.0, 30)).toDF("lon", "lat", "smod")
    val t = RasterZonal.zonalModal(tied, "lon", "lat", "smod", 1, "smod_class").head()
    assert(t.getAs[Int]("smod_class") == 30) // 1-1 tie: more built-up class
  }

  test("point count/mean and smod L1 reclass") {
    val pts = Seq((10.0, 10.0, 1.5), (10.1, 10.1, 2.5), (-10.0, 10.0, -0.5))
      .toDF("lon", "lat", "rwi")
    val c = RasterZonal.pointCounts(pts, "lon", "lat", 1, "n").orderBy("tile_id").collect()
    assert(c(1).getAs[Long]("n") == 2L)
    val m = RasterZonal.pointMean(pts, "lon", "lat", "rwi", 1, "rwi").orderBy("tile_id").collect()
    assert(m(1).getAs[Double]("rwi") == 2.0)
    assert(RasterZonal.SmodL2ToL1(13) == 1 && RasterZonal.SmodL2ToL1(23) == 2
      && RasterZonal.SmodL2ToL1(30) == 3)
  }

  test("buildBaseLayer: absent layer = NULL column; count layers fill 0; l1 derived") {
    val tiles = Seq("0", "1").toDF("tile_id")
    val smod = Seq(("1", 22)).toDF("tile_id", "smod_class")
    val counts = Seq(("1", 4L)).toDF("tile_id", "num_schools")
    val out = RasterZonal.buildBaseLayer(tiles, Seq(
        "smod_class" -> Some(smod),
        "num_schools" -> Some(counts),
        "rwi" -> None),
        fillZero = Set("num_schools"))
      .orderBy("tile_id").collect()
    val t0 = out(0); val t1 = out(1)
    assert(t1.getAs[Int]("smod_class") == 22 && t1.getAs[Int]("smod_class_l1") == 2)
    assert(t0.getAs[Long]("num_schools") == 0L)     // present count layer: confirmed zero
    assert(t0.isNullAt(t0.fieldIndex("rwi")))       // absent layer: data unavailable
    assert(t0.isNullAt(t0.fieldIndex("smod_class")))// tile missing from a value layer
  }

  test("rasterCells: real GeoTIFF bytes -> cells -> zonalSum == direct cells") {
    // the full S12 fetch path on actual raster bytes: decode + georef
    // produce exactly the cell-centroid rows zonalSum has always consumed
    val rasters = Seq(2L, 7L, 11L).map(id =>
      (id, graft.llm.Tiff.syntheticGeoTiff(id))).toDF("raster_id", "payload")
    val fromBytes = RasterZonal.rasterCells(rasters)
      .filter($"raster_ok").select($"lon", $"lat", $"value")
    val direct = Seq(2L, 7L, 11L).flatMap { id =>
      val lon0 = -72.0 + (id % 5) * 0.5
      val lat0 = 11.0 - (id % 3) * 0.5
      for (y <- 0 until 10; x <- 0 until 16) yield
        (lon0 + (x + 0.5) * 0.03125, lat0 - (y + 0.5) * 0.03125,
          ((id * 7 + y * 11 + x * 13) % 256).toDouble)
    }.toDF("lon", "lat", "value")
    val a = RasterZonal.zonalSum(fromBytes, "lon", "lat", "value", 8, "s")
      .as[(String, Double)].collect().toMap
    val b = RasterZonal.zonalSum(direct, "lon", "lat", "value", 8, "s")
      .as[(String, Double)].collect().toMap
    assert(a == b && a.nonEmpty && a.size > 1,
      s"zonal sums from real bytes diverge (tiles=${a.size})")
  }

  test("rasterCells: corrupt payloads quarantine, never throw") {
    val bad = graft.llm.Tiff.syntheticGeoTiff(3L)
    bad(0) = 'X'
    val truncated = java.util.Arrays.copyOf(graft.llm.Tiff.syntheticGeoTiff(4L), 60)
    val rasters = Seq((1L, graft.llm.Tiff.syntheticGeoTiff(1L)),
      (2L, bad), (3L, truncated), (4L, Array.emptyByteArray))
      .toDF("raster_id", "payload")
    val out = RasterZonal.rasterCells(rasters)
    assert(out.filter($"raster_ok").count() == 160)
    assert(out.filter(!$"raster_ok").count() == 3) // one marker per bad raster
  }
}
