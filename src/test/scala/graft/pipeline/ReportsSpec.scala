package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Null semantics of report assembly (reference reports.py:29-40,645-658):
  * non-optional demographic totals follow pandas' DEFAULT sum (all-NaN →
  * 0.0 → a confirmed 0 in the report); only the facility-count keys use
  * `_optional_ceil` (all-NaN → None = N/A). And no NPEs on null sums. */
class ReportsSpec extends SparkSpec {

  import spark.implicits._

  test("maxWindThreshold is null-safe: an all-null probability threshold breaks the scan, no NPE") {
    val adminView = Seq(
      ("A1", 34, Some(0.5)),
      ("A1", 40, None: Option[Double]), // all-null group -> sum = null
      ("A1", 50, Some(0.4))
    ).toDF("tile_id", "wind_threshold", "probability")
    // NaN > 0 is False in the reference -> ordered scan breaks at 40
    assert(Reports.maxWindThreshold(adminView) == 34)
  }

  private def mkViews(schoolAgeNull: Boolean): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val schoolAge: Option[Double] = if (schoolAgeNull) None else Some(10.0)
    val tileView = Seq(
      ("t1", 34, 0.5, Some(100.0), schoolAge, Some(5.0), Some(5.0),
        None: Option[Double], Some(1.0), None: Option[Double], None: Option[Double],
        Some(21.0), Some(-0.2)),
      ("t2", 34, 0.25, Some(50.0), schoolAge, Some(2.0), Some(2.0),
        None, Some(2.0), None, None, Some(10.0), Some(0.1))
    ).toDF("tile_id", "wind_threshold", "probability", "E_population",
      "E_school_age_population", "E_infant_population", "E_adolescent_population",
      "E_num_schools", "E_num_hcs", "E_num_shelters", "E_num_wash",
      "E_smod_class", "E_rwi")
    val adminView = Seq(
      ("A1", 34, 0.5, Some(150.0), schoolAge, Some(7.0), Some(7.0),
        None: Option[Double], Some(3.0), None: Option[Double], None: Option[Double])
    ).toDF("tile_id", "wind_threshold", "probability", "E_population",
      "E_school_age_population", "E_infant_population", "E_adolescent_population",
      "E_num_schools", "E_num_hcs", "E_num_shelters", "E_num_wash")
    val cciTiles = Seq(("t1", 12.0, 3.0, 1.0, 1.0))
      .toDF("tile_id", "E_CCI_pop", "E_CCI_school_age", "E_CCI_infants", "E_CCI_adolescents")
    val cciAdmin = Seq(("A1", 12.0, 3.0, 1.0, 1.0))
      .toDF("id", "E_CCI_pop", "E_CCI_school_age", "E_CCI_infants", "E_CCI_adolescents")
    (tileView, adminView, cciTiles, cciAdmin)
  }

  test("all-null E_school_age: pandas default-sum semantics -> confirmed 0, not a crash") {
    val (tv, av, cciT, cciA) = mkViews(schoolAgeNull = true)
    val report = Reports.doReport(tv, av, None, None, None, None, cciT, cciA,
      Seq("A1" -> "Region One"), None, None, "SYN", "STORM", "20260801000000")
    assert(report.nonEmpty)
    // reference reports.py:645: math.ceil(all-NaN pandas sum) = ceil(0.0) = 0
    assert(report("expected_school_age") == 0L)
    assert(report("expected_children") == report("expected_infants").asInstanceOf[Long] +
      report("expected_adolescent").asInstanceOf[Long])
    // optional facility keys (_optional_ceil) stay null on all-null sums —
    // then the no-data postprocess (reports.py:747-773) keeps them null
    assert(report("expected_shelters") == null)
    // per-wind demographic keys also follow pandas default sum
    assert(report("expected_school_34") == 0L)
  }

  test("non-null school age still sums and ceils normally") {
    val (tv, av, cciT, cciA) = mkViews(schoolAgeNull = false)
    val report = Reports.doReport(tv, av, None, None, None, None, cciT, cciA,
      Seq("A1" -> "Region One"), None, None, "SYN", "STORM", "20260801000000")
    assert(report("expected_school_age") == 20L) // ceil(10 + 10)
    assert(report("expected_cci_pop") == 12L)
  }
}
