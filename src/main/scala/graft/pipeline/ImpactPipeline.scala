package graft.pipeline

import graft.geo.GeoFunctions._
import graft.ops.{Aggregations, Cci, SpatialJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The storm impact dataflow (SURVEY.md §3.1) re-expressed as declarative
 * DataFrame pipelines. One call = one (storm, forecast, country) unit, like
 * the reference's create_views_from_envelopes_in_country
 * (impact_analysis.py:2757-2933) — but each per-threshold pandas loop
 * becomes a single DataFrame carrying `wind_threshold`.
 *
 * Scale notes: envelopes are ≤ 51 members × 8 thresholds per storm — always
 * broadcastable. Every view below is therefore a narrow map over the big side
 * (tiles/facilities) plus at most one small aggregation shuffle; tiles can be
 * partitioned by quadkey prefix without affecting results.
 */
object ImpactPipeline {

  /**
   * Tile impact view (impact_analysis.py:1855-1927): per (tile, threshold)
   * probability = intersecting-member-count / 51, E_col = col * probability
   * for every data column, raw data columns dropped. All tiles are retained
   * per threshold (probability 0 included) — the CCI band algebra needs the
   * complete grid.
   */
  def tileView(tiles: DataFrame, envelopes: DataFrame): DataFrame = {
    val withProb = SpatialJoin.probabilityByThreshold(
      tiles, "geometry", envelopes, "geometry", keepZeroRows = true)
    val withE = Aggregations.expectedValues(withProb, Constants.TileDataCols)
    withE
      .drop(Constants.TileDataCols.filter(withE.columns.contains): _*)
      .withColumnRenamed("tile_id", "zone_id")
      .drop("geometry")
  }

  /**
   * Per-facility impact view (impact_analysis.py:1620-1686): facilities
   * buffered 150 m, probability per (facility, threshold); all facility
   * attributes preserved; one row per facility per threshold.
   */
  def facilityView(facilities: DataFrame, envelopes: DataFrame, idCol: String,
                   bufferMeters: Double = Constants.FacilityBufferMeters): DataFrame = {
    val buffered = facilities.withColumn("__buffered",
      st_buffer_m(col("geometry"), lit(bufferMeters)))
    SpatialJoin.probabilityByThreshold(
        buffered, "__buffered", envelopes, "geometry", keepZeroRows = true)
      .drop("__buffered")
      .withColumn("zone_id", col(idCol))
  }

  /**
   * Admin impact view (impact_analysis.py:1930-2035): tile view rows mapped
   * to admin `id`, grouped: SUM for E_ count/population columns (optional —
   * all-null stays null — for the facility-count E_cols,
   * impact_analysis.py:152-164), MEAN for E_smod/E_rwi/probability. Output
   * keys the admin id in a column named `tile_id` (reference naming quirk,
   * impact_analysis.py:2019-2022) plus the admin `name`.
   */
  def adminView(tileViewDf: DataFrame, tileAdminIds: DataFrame, admins: DataFrame): DataFrame = {
    val sumCols = Seq("E_population", "E_school_age_population",
      "E_infant_population", "E_adolescent_population", "E_built_surface_m2",
      "E_num_schools", "E_num_hcs", "E_num_shelters", "E_num_wash")
    val avgCols = Seq("E_smod_class", "E_smod_class_l1", "E_rwi", "probability")
    // the tile view retains the base layer's admin `id` when present
    // (reference create_admin_view_from_envelopes_new: reuses df_view['id'])
    val withId =
      if (tileViewDf.columns.contains("id")) tileViewDf
      else tileViewDf.join(
        broadcast(tileAdminIds.select(col("tile_id").as("zone_id"), col("id"))),
        Seq("zone_id"), "left")
    val aggs = sumCols.filter(withId.columns.contains).map(c => sum(col(c)).as(c)) ++
      avgCols.filter(withId.columns.contains).map(c => avg(col(c)).as(c))
    withId.groupBy(col("wind_threshold"), col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("id", "tile_id")
      .join(broadcast(admins.select(col("id").as("tile_id"), col("name"))), Seq("tile_id"), "left")
  }

  /**
   * Track (per-ensemble-member) severity view (impact_analysis.py:2038-2091):
   * per (threshold, member) envelope — facility counts within the envelope
   * (null column when a facility layer is absent) and sums of tile metrics
   * over intersecting tiles. Envelope side is small: both passes are
   * broadcast matches over the big side, aggregated by (threshold, member).
   */
  def trackView(envelopes: DataFrame,
                schools: DataFrame, hcs: DataFrame,
                shelters: Option[DataFrame], wash: Option[DataFrame],
                tiles: DataFrame): DataFrame = {
    val spark = envelopes.sparkSession
    val envRows = graft.util.Collects.boundedCollect(
      envelopes.select(col("wind_threshold"), col("ensemble_member"), col("geometry")),
      what = "trackView envelope side",
      alternative = "SpatialJoin.quadkeyRefineJoin + groupBy")
    val envKeys = envRows.map(r => (r.getInt(0), r.getInt(1)))
    val envWkb = envRows.map(_.getAs[Array[Byte]](2))
    import spark.implicits._
    val envKeyDf = envKeys.zipWithIndex
      .map { case ((th, m), i) => (i, th, m) }.toSeq
      .toDF("__env", "wind_threshold", "ensemble_member")

    // facility points per envelope (points-in-polygon count, J3)
    def facilityCounts(fac: DataFrame, outCol: String): DataFrame =
      SpatialJoin.broadcastMatch(fac, "geometry", envWkb, SpatialJoin.Intersects, "__envs")
        .select(explode(col("__envs")).as("__env"))
        .groupBy("__env").agg(count(lit(1)).as(outCol))

    // tile metric sums per envelope (intersects, aggregation='sum')
    val tileMetrics = Seq("population", "school_age_population",
      "infant_population", "adolescent_population", "built_surface_m2")
      .filter(tiles.columns.contains)
    val tileSums = SpatialJoin.broadcastMatch(tiles, "geometry", envWkb, SpatialJoin.Intersects, "__envs")
      .select(col("__envs") +: tileMetrics.map(col): _*)
      .select(explode(col("__envs")).as("__env") +: tileMetrics.map(col): _*)
      .groupBy("__env")
      .agg(tileMetrics.map(c => sum(col(c)).as(s"severity_$c")).head,
           tileMetrics.map(c => sum(col(c)).as(s"severity_$c")).tail: _*)

    val base = envKeyDf
      .join(facilityCounts(schools, "severity_schools"), Seq("__env"), "left")
      .join(facilityCounts(hcs, "severity_hcs"), Seq("__env"), "left")
    val withShelters = shelters match {
      case Some(s) if !s.isEmpty => base.join(facilityCounts(s, "severity_num_shelters"), Seq("__env"), "left")
        .na.fill(0, Seq("severity_num_shelters"))
      case _ => base.withColumn("severity_num_shelters", lit(null).cast("double"))
    }
    val withWash = wash match {
      case Some(w2) if !w2.isEmpty => withShelters.join(facilityCounts(w2, "severity_num_wash"), Seq("__env"), "left")
        .na.fill(0, Seq("severity_num_wash"))
      case _ => withShelters.withColumn("severity_num_wash", lit(null).cast("double"))
    }
    withWash
      .join(tileSums, Seq("__env"), "left")
      .na.fill(0, Seq("severity_schools", "severity_hcs") ++ tileMetrics.map(c => s"severity_$c"))
      .drop("__env")
  }

  /** CCI tile + admin views (impact_analysis.py:2579-2748, 2897-2917). */
  def cciViews(tileViewDf: DataFrame, tilesWithAdminId: DataFrame): (DataFrame, DataFrame) = {
    val cciTiles = Cci.calculate(tileViewDf, tilesWithAdminId)
    (cciTiles, Cci.adminRollup(cciTiles))
  }
}
