package graft.ops

import graft.geo.GeoFunctions.st_quadkey
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * S12 — raster zonal ingestion (reference impact_analysis.py:813-969): the
 * WorldPop age-band population sums, GHSL built-surface sum, GHS-SMOD
 * settlement-class assignment, and point-layer count/mean aggregations that
 * enrich the zoom-N mercator tile view, plus the base-layer assembly with
 * the reference's NaN-fallback semantics for unavailable layers.
 *
 * Spark-first shape: a raster is a DataFrame of cells — (lon, lat, value)
 * for the cell centroid — and "zonal stats" is cell → quadkey assignment
 * (`st_quadkey`, pure arithmetic, codegen-free but narrow) followed by one
 * hash aggregation. No geometry predicate is evaluated: centroid-within a
 * Web-Mercator tile IS the quadkey function, which is why this scales to a
 * 100 m global raster (~60B cells) as a single shuffle on tile_id.
 *
 * Two deliberate departures from the reference, both scale-driven:
 *  - the reference maps each age band in its own `map_wp_pop` pass over the
 *    rasters (impact_analysis.py:826-872: four sequential calls);
 *    [[ageBandSums]] folds every band into ONE scan + ONE aggregation of
 *    conditional sums;
 *  - the 3-attempt retry loop wraps the *download*, not the math — that
 *    half lives with the fetch connectors (graft.io.ApiFetchers), keeping
 *    the zonal operator deterministic.
 */
object RasterZonal {

  /** GHS-SMOD level-2 → level-1 reclassification
    * (impact_analysis.py:296-305): 1x=rural, 2x=suburban, 30=urban centre. */
  val SmodL2ToL1: Map[Int, Int] =
    Map(10 -> 1, 11 -> 1, 12 -> 1, 13 -> 1, 21 -> 2, 22 -> 2, 23 -> 2, 30 -> 3)

  def smodL1(smodClass: Column): Column = {
    val m = typedLit(SmodL2ToL1)
    m(smodClass)
  }

  private def withTile(cells: DataFrame, lon: String, lat: String, zoom: Int): DataFrame =
    cells.withColumn("tile_id", st_quadkey(col(lon), col(lat), lit(zoom)))

  /**
   * REAL-BYTES raster ingestion: explode GeoTIFF payload rows into the
   * (lon, lat, value) cell-centroid rows every zonal operator below
   * consumes — the fetch side of S12 on actual raster bytes instead of
   * pre-aggregated tile inputs. Decode is `llm/Tiff.decodeRaster`
   * (single-band Float32/uint8) + `geoReference` (ModelTiepoint/
   * ModelPixelScale north-up affine); pixel (x, y) lands at its CENTER.
   * Undecodable or un-georeferenced payloads QUARANTINE as zero rows with
   * `raster_ok = false` markers — a corrupt tile never kills the task
   * (the io/Warc d87 contract). One narrow per-row flatMap; at a 100 m
   * global raster the unit of parallelism is the raster tile file,
   * exactly how WorldPop/GHSL ship.
   */
  def rasterCells(rasters: DataFrame, idCol: String = "raster_id",
                  payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      (graft.llm.Tiff.decodeRaster(payload), graft.llm.Tiff.geoReference(payload)) match {
        case (Some((w, h, px)), Some((lon0, lat0, pw, ph))) =>
          val out = new Array[(Double, Double, Double, Boolean)](w * h)
          var i = 0
          while (i < w * h) {
            val x = i % w
            val y = i / w
            out(i) = (lon0 + (x + 0.5) * pw, lat0 - (y + 0.5) * ph,
              px(i).toDouble, true)
            i += 1
          }
          out.toSeq
        case _ => Seq((0.0, 0.0, 0.0, false))
      }
    }
    rasters.withColumn("__c", explode(dec(col(payloadCol))))
      .select(col(idCol),
        col("__c._1").as("lon"), col("__c._2").as("lat"),
        col("__c._3").as("value"), col("__c._4").as("raster_ok"))
  }

  /** Sum of a cell value per tile (map_built_s / map_wp_pop total). */
  def zonalSum(cells: DataFrame, lon: String, lat: String, value: String,
               zoom: Int, out: String): DataFrame =
    withTile(cells, lon, lat, zoom)
      .groupBy(col("tile_id")).agg(sum(col(value)).as(out))

  /** All age-band sums in one scan + one aggregation. `bands` maps output
    * column → inclusive [minAge, maxAge] band range
    * (impact_analysis.py:178-183: school 5-14, infant 0-1, adolescent 15). */
  def ageBandSums(cells: DataFrame, lon: String, lat: String, band: String,
                  value: String, zoom: Int,
                  bands: Seq[(String, Int, Int)]): DataFrame = {
    val aggs = bands.map { case (out, lo, hi) =>
      sum(when(col(band).between(lo, hi), col(value))).as(out)
    } :+ sum(col(value)).as("population")
    withTile(cells, lon, lat, zoom)
      .groupBy(col("tile_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Majority (modal) class per tile (map_smod). Deterministic tie-break:
    * larger cell count wins, then the higher class code — a tie between
    * rural and urban reads as the more built-up class. */
  def zonalModal(cells: DataFrame, lon: String, lat: String, cls: String,
                 zoom: Int, out: String): DataFrame =
    withTile(cells, lon, lat, zoom)
      .groupBy(col("tile_id"), col(cls).as(out))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("tile_id"))
      .agg(max_by(col(out), struct(col("__n"), col(out))).as(out))

  /** Point-layer aggregation (map_points): count per tile, or the mean of a
    * value column (RWI uses aggregation='mean', impact_analysis.py:965). */
  def pointCounts(points: DataFrame, lon: String, lat: String, zoom: Int,
                  out: String): DataFrame =
    withTile(points, lon, lat, zoom)
      .groupBy(col("tile_id")).agg(count(lit(1)).as(out))

  def pointMean(points: DataFrame, lon: String, lat: String, value: String,
                zoom: Int, out: String): DataFrame =
    withTile(points, lon, lat, zoom)
      .groupBy(col("tile_id")).agg(avg(col(value)).as(out))

  /**
   * Base-layer assembly (impact_analysis.py:880-969): left-join each
   * per-tile layer onto the tile universe. A layer given as None — the API
   * failed, no custom override — lands as an all-null column ("data
   * unavailable", NOT zero), preserving the reference's NaN-vs-0 contract;
   * a tile missing from a present point layer is a confirmed zero only for
   * count layers, so those pass through fillZero. `smod_class_l1` is always
   * derived from `smod_class`, never supplied (impact_analysis.py:912-915).
   */
  def buildBaseLayer(tiles: DataFrame,
                     layers: Seq[(String, Option[DataFrame])],
                     fillZero: Set[String] = Set.empty): DataFrame = {
    val joined = layers.foldLeft(tiles) { case (acc, (colName, layer)) =>
      layer match {
        case Some(df) =>
          val j = acc.join(df.select(col("tile_id"), col(colName)), Seq("tile_id"), "left")
          if (fillZero(colName))
            j.withColumn(colName, coalesce(col(colName), lit(0).cast("long")))
          else j
        case None => acc.withColumn(colName, lit(null).cast("double"))
      }
    }
    if (joined.columns.contains("smod_class"))
      joined.withColumn("smod_class_l1", smodL1(col("smod_class")))
    else joined
  }
}
