package graft.ops

import graft.pipeline.Constants
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Child Cyclone Index (SURVEY.md W5; reference impact_analysis.py:2579-2748).
 *
 * For thresholds w_1 < ... < w_k present in the storm's envelope set, per
 * tile and demographic metric m:
 *
 *   band_i   = m * [p_i > 0] - m * [p_{i+1} > 0]      (last band unsubtracted)
 *   CCI_m    = sum_i band_i * w_i^2 * 1e-6
 *   E_band_i = E_i(m) - E_{i+1}(m)                    (last band unsubtracted)
 *   E_CCI_m  = sum_i E_band_i * w_i^2 * 1e-6
 *
 * for 5 demographics (children = school_age + infant + adolescent;
 * school_age; infants; adolescents; population) × {CCI, E_CCI}. Expressed as
 * one `lead` window over the per-(tile, threshold) long view + one groupBy —
 * all 10 indexes in a single pass (the reference loops 10× over the tile set).
 *
 * Null semantics match pandas: a missing metric/E column yields null CCI for
 * every tile (NaN in the reference).
 */
object Cci {

  val CciCols: Seq[String] = Seq(
    "CCI_children", "E_CCI_children", "CCI_school_age", "E_CCI_school_age",
    "CCI_infants", "E_CCI_infants", "CCI_adolescents", "E_CCI_adolescents",
    "CCI_pop", "E_CCI_pop")

  /** Demographic name -> base metric column(s) summed to form it. */
  val Demographics: Seq[(String, Seq[String])] = Seq(
    "children"    -> Seq("school_age_population", "infant_population", "adolescent_population"),
    "school_age"  -> Seq("school_age_population"),
    "infants"     -> Seq("infant_population"),
    "adolescents" -> Seq("adolescent_population"),
    "pop"         -> Seq("population"))

  /**
   * @param tileView long-format tile view: (zoneIdCol, wind_threshold,
   *                 probability, E_* columns) — every tile × every present
   *                 threshold (probability may be 0).
   * @param tiles    base tile layer: (tile_id, id, demographic columns).
   * @return one row per tile: zone_id, 10 CCI columns, id
   *         (reference output schema impact_analysis.py:2575-2576,2740-2748).
   */
  def calculate(tileView: DataFrame, tiles: DataFrame,
                zoneIdCol: String = "zone_id"): DataFrame = {
    val w = Window.partitionBy(col(zoneIdCol)).orderBy(col("wind_threshold"))
    val weight = col("wind_threshold").cast("double") * col("wind_threshold") * lit(1e-6)

    // indicator band: [p_i>0] - [p_{i+1}>0]; the lead past the last
    // threshold defaults to 0 (last band unsubtracted)
    val ind = when(col("probability") > 0, lit(1.0)).otherwise(lit(0.0))
    val indBand = ind - lead(ind, 1, 0.0).over(w)

    val baseCols = col("tile_id").as(zoneIdCol) +:
      (if (tiles.columns.contains("id")) col("id") else lit(null).cast("string").as("id")) +:
      Constants.CciDemographics.map(c =>
        (if (tiles.columns.contains(c)) col(c) else lit(null).cast("double")).as(c))
    val base = tiles.select(baseCols: _*)

    val joined = tileView.drop("id").join(base, Seq(zoneIdCol), "left")

    // per-row band contributions for all 10 indexes
    val contribs = Demographics.flatMap { case (name, cols) =>
      val metric = cols.map(col).reduce(_ + _)
      val eMetric = cols.map { c =>
        val e = s"E_$c"
        if (tileView.columns.contains(e)) col(e) else lit(null).cast("double")
      }.reduce(_ + _)
      val eBand = eMetric - lead(eMetric, 1, 0.0).over(w)
      Seq((metric * indBand * weight).as(s"__CCI_$name"),
          (eBand * weight).as(s"__E_CCI_$name"))
    }

    val banded = joined.select(col(zoneIdCol) +: col("id") +: contribs: _*)

    val aggs = Demographics.flatMap { case (name, _) =>
      Seq(sum(col(s"__CCI_$name")).as(s"CCI_$name"),
          sum(col(s"__E_CCI_$name")).as(s"E_CCI_$name"))
    }
    banded.groupBy(col(zoneIdCol), col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(zoneIdCol) +: CciCols.map(col) :+ col("id"): _*)
  }

  /** Admin rollup of a CCI tile view: sum the 10 CCI columns per admin id
    * (impact_analysis.py:2897-2917). */
  def adminRollup(cciTiles: DataFrame): DataFrame = {
    val aggs = CciCols.map(c => sum(col(c)).as(c))
    cciTiles.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }
}
