package graft.ops

import graft.geo.GeoFunctions._
import graft.pipeline.Constants
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ingest-edge operators: WKT decode (S7), raster-point zonal statistics
 * (S12), and small-map reclassification scalars (§2.7 "Map lookup").
 */
object Ingest {

  /**
   * Envelope WKT decode (S7, snowflake_utils.py:429-480): uppercase wire
   * columns → lowercase, WKT → WKB geometry, unparsable/missing geometry
   * rows dropped. Narrow pass.
   */
  def decodeEnvelopes(raw: DataFrame, wktCol: String = "ENVELOPE_REGION"): DataFrame = {
    val lowered = raw.columns.foldLeft(raw) { (d, c) => d.withColumnRenamed(c, c.toLowerCase) }
    lowered
      .withColumn("geometry", st_geomFromWKT(col(wktCol.toLowerCase)))
      .drop(wktCol.toLowerCase)
      .na.drop(Seq("geometry"))
  }

  /**
   * Zonal statistics from raster-like points (S12, the custom-tile-CSV
   * contract of impact_analysis.py:813-969): assign each (lon, lat, value)
   * point its zoom-`zoom` quadkey and aggregate per tile. Axis-aligned tiles
   * mean the zone join is a pure equi-key groupBy — no geometry predicate,
   * shuffles only on the tile key (SURVEY.md J3 note).
   */
  def zonalStats(points: DataFrame, zoom: Int,
                 lonCol: String = "longitude", latCol: String = "latitude",
                 valueCol: String = "value",
                 aggregation: String = "sum"): DataFrame = {
    val agg: Column = aggregation match {
      case "sum" => sum(col(valueCol))
      case "mean" => avg(col(valueCol))
      case "count" => count(lit(1))
      case other => throw new IllegalArgumentException(s"unknown aggregation: $other")
    }
    points
      .withColumn("tile_id", st_quadkey(col(lonCol), col(latCol), lit(zoom)))
      .groupBy("tile_id")
      .agg(agg.as(valueCol))
  }

  /** Unnamed-CSV-index-column scrub (F9,
    * geosight/admin_related_table.py:145-147): drop `Unnamed:*` columns that
    * pandas-written CSVs carry. */
  def dropUnnamedColumns(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith("Unnamed:")).toIndexedSeq: _*)

  /** SMOD L2 (10..30) → L1 (1/2/3) reclassification as a literal-map lookup
    * (impact_analysis.py:296-305): codegen'd `element_at`, null for unknown
    * classes (matches pandas .map → NaN). */
  def smodL1(smodClass: Column): Column =
    element_at(
      typedlit(Constants.SmodL2ToL1.map { case (k, v) => k -> v }),
      smodClass.cast("int"))
}
