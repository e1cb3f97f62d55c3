package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregationsSpec extends SparkSpec {

  import spark.implicits._

  test("nanToNull then sum = reference _optional_sum (all-NaN group stays null)") {
    val df = Seq(
      ("g1", Some(1.0)), ("g1", None), ("g2", None), ("g2", None),
      ("g3", Some(Double.NaN)), ("g3", Some(2.0))
    ).toDF("g", "v")
    val normalized = Aggregations.nanToNull(df, Seq("v"))
    val out = normalized.groupBy("g").agg(Aggregations.optionalSum($"v").as("s"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("g1").contains(1.0))
    assert(out("g2").isEmpty)        // all null -> null, NOT 0
    assert(out("g3").contains(2.0))  // NaN treated as no-data, not poison
  }

  test("expectedValues: E_col = col * probability; missing col -> null") {
    val df = Seq(("t1", 0.5, 100.0)).toDF("tile_id", "probability", "population")
    val out = Aggregations.expectedValues(df, Seq("population", "num_wash")).head()
    assert(out.getAs[Double]("E_population") == 50.0)
    assert(out.isNullAt(out.fieldIndex("E_num_wash")))
  }

  test("adminRollup sums count cols, averages class cols") {
    val df = Seq(
      ("A", 10.0, 1.0, 100.0), ("A", 20.0, 3.0, 200.0), ("B", 5.0, 2.0, 50.0)
    ).toDF("id", "population", "smod_class", "built_surface_m2")
    val out = Aggregations.adminRollup(df, "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("population") == 30.0)
    assert(out("A").getAs[Double]("smod_class") == 2.0)
    assert(out("A").getAs[Double]("built_surface_m2") == 300.0)
    assert(out("B").getAs[Double]("population") == 5.0)
  }

  test("adminRollup null semantics: non-optional all-null -> 0.0, optional all-null -> null") {
    // reference impact_analysis.py:1443-1446: pandas default sum (all-NaN -> 0)
    // for population etc.; _optional_sum (all-NaN -> null) only for the
    // facility-count columns
    val df = Seq(
      ("A", None: Option[Double], None: Option[Double]),
      ("A", None, None),
      ("B", Some(3.0), Some(1.0))
    ).toDF("id", "population", "num_schools")
    val out = Aggregations.adminRollup(df, "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("population") == 0.0)          // pandas default sum
    assert(out("A").isNullAt(out("A").fieldIndex("num_schools"))) // optional sum
    assert(out("B").getAs[Double]("population") == 3.0)
    assert(out("B").getAs[Double]("num_schools") == 1.0)
  }

  test("vulnerabilityBuckets: urban/poverty banding on de-expected values") {
    // reference reports.py:393-462: actual = E/p; urban iff E_smod/p >= 20;
    // severe iff E_rwi/p < -1; poverty iff < -0.5
    val tiles = Seq(
      // urban severe: smod 25, rwi -1.5
      ("t1", 0.5, 50.0, 10.0, 5.0, 2.5, 12.5, -0.75),
      // rural none: smod 11, rwi 0.3
      ("t2", 0.5, 40.0, 8.0, 4.0, 2.0, 5.5, 0.15),
      // excluded: p = 0
      ("t3", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    ).toDF("tile_id", "probability", "E_population", "E_school_age_population",
      "E_infant_population", "E_adolescent_population", "E_smod_class", "E_rwi")
    val out = Aggregations.vulnerabilityBuckets(tiles)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("sum_population")).toMap
    assert(out.keySet == Set(("urban", "severe"), ("rural", "none")))
    assert(math.abs(out(("urban", "severe")) - 100.0) < 1e-9) // 50/0.5
    assert(math.abs(out(("rural", "none")) - 80.0) < 1e-9)
  }
}
