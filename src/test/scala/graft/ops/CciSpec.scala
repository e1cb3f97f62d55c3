package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CciSpec extends SparkSpec {

  import spark.implicits._

  // Hand-computed fixture (reference semantics impact_analysis.py:2579-2748):
  // thresholds 34 < 64; weights w^2*1e-6 = 0.001156, 0.004096.
  // tile T1: p(34)=0.5, p(64)=0.2  -> ind bands: [1-1, 1] = [0, 1]
  //   CCI_pop = pop * (0*0.001156 + 1*0.004096)
  // tile T2: p(34)=0.5, p(64)=0    -> bands [1-0, 0] = [1, 0]
  //   CCI_pop = pop * 0.001156
  // tile T3: p(34)=0,   p(64)=0    -> CCI_pop = 0
  private val tileView = Seq(
    ("T1", 34, 0.5, 100.0 * 0.5), ("T1", 64, 0.2, 100.0 * 0.2),
    ("T2", 34, 0.5, 200.0 * 0.5), ("T2", 64, 0.0, 0.0),
    ("T3", 34, 0.0, 0.0), ("T3", 64, 0.0, 0.0)
  ).toDF("zone_id", "wind_threshold", "probability", "E_population")

  private val tiles = Seq(
    ("T1", "A1", 100.0, 30.0, 10.0, 8.0),
    ("T2", "A1", 200.0, 60.0, 20.0, 16.0),
    ("T3", "A2", 400.0, 120.0, 40.0, 32.0)
  ).toDF("tile_id", "id", "population", "school_age_population",
    "infant_population", "adolescent_population")

  test("CCI band algebra matches hand computation") {
    val out = Cci.calculate(tileView, tiles)
      .select("zone_id", "CCI_pop", "E_CCI_pop", "CCI_children")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    val w34 = 34.0 * 34 * 1e-6; val w64 = 64.0 * 64 * 1e-6
    assert(math.abs(out("T1")._1 - 100.0 * w64) < 1e-9)
    assert(math.abs(out("T2")._1 - 200.0 * w34) < 1e-9)
    assert(math.abs(out("T3")._1 - 0.0) < 1e-9)
    // E_CCI: bands on E values: T1: [50-20, 20] -> 30*w34 + 20*w64
    assert(math.abs(out("T1")._2 - (30 * w34 + 20 * w64)) < 1e-9)
    assert(math.abs(out("T2")._2 - 100 * w34) < 1e-9)
    // children = school+infant+adolescent = 48 for T1
    assert(math.abs(out("T1")._3 - 48.0 * w64) < 1e-9)
  }

  test("CCI telescoping identity: all-threshold-hit tile reduces to sum of weight diffs") {
    // if p>0 at every threshold, CCI = m * w_last^2*1e-6 + 0-bands
    val tv = Seq(("T", 34, 0.3, 0.0), ("T", 64, 0.3, 0.0), ("T", 96, 0.3, 0.0))
      .toDF("zone_id", "wind_threshold", "probability", "E_population")
    val ts = Seq(("T", "A", 100.0, 0.0, 0.0, 0.0))
      .toDF("tile_id", "id", "population", "school_age_population",
        "infant_population", "adolescent_population")
    val cci = Cci.calculate(tv, ts).select("CCI_pop").as[Double].head()
    assert(math.abs(cci - 100.0 * 96 * 96 * 1e-6) < 1e-9)
  }

  test("missing metric column yields null CCI (NaN semantics)") {
    val tv = Seq(("T", 34, 0.5, 1.0)).toDF("zone_id", "wind_threshold", "probability", "E_population")
    val ts = Seq(("T", "A")).toDF("tile_id", "id") // no demographics at all
    val row = Cci.calculate(tv, ts).select("CCI_pop", "E_CCI_infants").head()
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
  }

  test("admin rollup sums CCI columns per admin id") {
    val cciTiles = Cci.calculate(tileView, tiles)
    val rollup = Cci.adminRollup(cciTiles)
      .select("id", "CCI_pop").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w34 = 34.0 * 34 * 1e-6; val w64 = 64.0 * 64 * 1e-6
    assert(math.abs(rollup("A1") - (100 * w64 + 200 * w34)) < 1e-9)
    assert(math.abs(rollup("A2") - 0.0) < 1e-9)
  }
}
