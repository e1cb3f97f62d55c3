package graft.ops

import graft.SparkSpec
import graft.geo.{Geo, Quadkey}
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  import spark.implicits._

  test("decodeEnvelopes: lowercase renames, WKT->WKB, unparsable dropped (S7)") {
    val raw = Seq(
      (1, 34, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      (2, 34, "not-a-geometry"),
      (3, 64, null)
    ).toDF("ENSEMBLE_MEMBER", "WIND_THRESHOLD", "ENVELOPE_REGION")
    val out = Ingest.decodeEnvelopes(raw)
    assert(out.columns.toSet == Set("ensemble_member", "wind_threshold", "geometry"))
    val rows = out.collect()
    assert(rows.length == 1)
    assert(Geo.fromWkb(rows(0).getAs[Array[Byte]]("geometry")).getArea == 1.0)
  }

  test("zonalStats: per-quadkey sum/mean/count match hand-binned values (S12)") {
    // two points in the same zoom-10 tile, one elsewhere
    val qk = Quadkey.quadkeyForLonLat(-72.31, 18.53, 10)
    val (minLon, minLat, maxLon, maxLat) = Quadkey.quadkeyBounds(qk)
    val cLon = (minLon + maxLon) / 2; val cLat = (minLat + maxLat) / 2
    val pts = Seq(
      (cLon, cLat, 10.0), (cLon + 1e-4, cLat + 1e-4, 30.0), (50.0, 50.0, 7.0)
    ).toDF("longitude", "latitude", "value")
    val sums = Ingest.zonalStats(pts, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums(qk) == 40.0)
    assert(sums(Quadkey.quadkeyForLonLat(50.0, 50.0, 10)) == 7.0)
    val means = Ingest.zonalStats(pts, 10, aggregation = "mean").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means(qk) == 20.0)
  }

  test("dropUnnamedColumns scrubs pandas index columns (F9)") {
    val df = Seq((1, "x", "junk")).toDF("id", "name", "Unnamed: 0")
    assert(Ingest.dropUnnamedColumns(df).columns.toSeq == Seq("id", "name"))
  }

  test("smodL1 reclass: known classes map, unknown -> null") {
    val df = Seq(11.0, 22.0, 30.0, 99.0).toDF("smod_class")
      .withColumn("l1", Ingest.smodL1(col("smod_class")))
    val out = df.collect().map(r => r.getDouble(0) -> Option(r.get(1))).toMap
    assert(out(11.0).contains(1) && out(22.0).contains(2) && out(30.0).contains(3))
    assert(out(99.0).isEmpty)
  }
}
