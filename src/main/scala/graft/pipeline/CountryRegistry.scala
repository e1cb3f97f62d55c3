package graft.pipeline

import graft.geo.Geo
import graft.io.DataStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Country registry control tables (S16; reference country_utils.py:16-214 and
 * write_country_boundary, impact_analysis.py:1145-1186). The reference keeps
 * two warehouse tables:
 *
 *  - `PIPELINE_COUNTRIES`: one row per country — code, name, mercator zoom,
 *    map center/zoom for visualization, active flag, last-initialized
 *    timestamp, and the admin-0 boundary geography.
 *  - `PIPELINE_COUNTRY_ZOOM_LEVELS`: (country, zoom) → last-initialized —
 *    the primary per-zoom initialization tracking.
 *
 * Re-expressed here as two small parquet control tables under the
 * [[DataStore]] root. They are driver-maintained dimension tables (a few
 * hundred rows at most — one per country), so read-modify-write through the
 * driver is the right scale choice; the big data never flows through them.
 */
object CountryRegistry {

  val CountriesRel = "control/pipeline_countries.parquet"
  val ZoomLevelsRel = "control/pipeline_country_zoom_levels.parquet"

  val countriesSchema: StructType = StructType(Seq(
    StructField("country_code", StringType, nullable = false),
    StructField("country_name", StringType),
    StructField("zoom_level", IntegerType),
    StructField("center_lat", DoubleType),
    StructField("center_lon", DoubleType),
    StructField("view_zoom", IntegerType),
    StructField("notes", StringType),
    StructField("active", BooleanType),
    StructField("is_region", BooleanType),
    StructField("last_initialized", StringType),
    StructField("country_boundary", BinaryType))) // WKB

  val zoomLevelsSchema: StructType = StructType(Seq(
    StructField("country_code", StringType, nullable = false),
    StructField("zoom_level", IntegerType, nullable = false),
    StructField("last_initialized", StringType)))

  private def readOrEmpty(spark: SparkSession, store: DataStore, rel: String,
                          schema: StructType): DataFrame =
    store.controlTables.read(spark, rel, schema)

  def countries(spark: SparkSession, store: DataStore): DataFrame =
    readOrEmpty(spark, store, CountriesRel, countriesSchema)

  def zoomLevels(spark: SparkSession, store: DataStore): DataFrame =
    readOrEmpty(spark, store, ZoomLevelsRel, zoomLevelsSchema)

  /** Atomically replace a control table (backend-dependent: tmp + move on
    * parquet, transactional overwrite over JDBC — see [[ControlBackend]]). */
  private def overwrite(store: DataStore, df: DataFrame, rel: String): Unit =
    store.controlTables.replace(df, rel)

  /**
   * Register a country (add_country_to_snowflake, country_utils.py:73-121):
   * inserts a new active row; returns false (no change) if the code exists.
   */
  def addCountry(spark: SparkSession, store: DataStore, countryCode: String,
                 countryName: Option[String] = None, zoomLevel: Int = 14,
                 centerLat: Option[Double] = None, centerLon: Option[Double] = None,
                 viewZoom: Option[Int] = None, notes: Option[String] = None): Boolean = {
    val existing = countries(spark, store)
    if (!existing.filter(col("country_code") === countryCode).isEmpty) return false
    val row = Row(countryCode, countryName.getOrElse(countryCode), zoomLevel,
      centerLat.orNull, centerLon.orNull, viewZoom.orNull, notes.orNull,
      true, false, null, null)
    val appended = existing.unionByName(
      spark.createDataFrame(java.util.List.of(row), countriesSchema))
    overwrite(store, appended, CountriesRel)
    true
  }

  /** Active, non-region country codes, ordered
    * (get_active_countries_from_snowflake, country_utils.py:16-41). */
  def activeCountries(spark: SparkSession, store: DataStore): Seq[String] =
    countries(spark, store)
      .filter(col("active") && (col("is_region").isNull || !col("is_region")))
      .orderBy("country_code")
      .select("country_code").collect().map(_.getString(0)).toSeq

  /**
   * Stamp initialization for (country, zoom) in BOTH tables
   * (update_country_initialized, country_utils.py:134-214): upsert the
   * per-zoom row, refresh the country's last_initialized.
   */
  def markInitialized(spark: SparkSession, store: DataStore, countryCode: String,
                      zoomLevel: Option[Int] = None,
                      now: String = java.time.Instant.now().toString): Unit = {
    val cs = countries(spark, store)
    val zl = zoomLevels(spark, store)
    val zoom = zoomLevel.orElse {
      cs.filter(col("country_code") === countryCode).select("zoom_level")
        .collect().headOption.map(_.getInt(0))
    }.getOrElse(return)

    val others = zl.filter(!(col("country_code") === countryCode && col("zoom_level") === zoom))
    val upserted = others.unionByName(spark.createDataFrame(
      java.util.List.of(Row(countryCode, zoom, now)), zoomLevelsSchema))
    overwrite(store, upserted, ZoomLevelsRel)

    val refreshed = cs.withColumn("last_initialized",
      when(col("country_code") === countryCode, lit(now)).otherwise(col("last_initialized")))
    overwrite(store, refreshed, CountriesRel)
  }

  /**
   * Union the admin-0 boundary, derive center + zoom-span heuristic, write to
   * the registry (write_country_boundary, impact_analysis.py:1145-1186):
   * view_zoom = 11 if span < 0.5° else 10 if < 1 else 9 if < 2 else
   * 8 if < 4 else 7; COALESCE semantics — never clobber a manually-set
   * center/zoom; the boundary itself always refreshes.
   */
  def writeCountryBoundary(spark: SparkSession, store: DataStore, countryCode: String,
                           admin0: DataFrame, geomCol: String = "geometry"): Unit = {
    val wkbs = graft.util.Collects.boundedCollect(
      admin0.select(col(geomCol)), what = "writeCountryBoundary admin0 side",
      alternative = "pre-union the boundary with st_union_agg")
      .map(_.getAs[Array[Byte]](0)).filter(_ != null)
    if (wkbs.isEmpty) return
    val geoms = wkbs.map(Geo.fromWkb)
    val union = if (geoms.length == 1) geoms.head
      else org.locationtech.jts.operation.union.UnaryUnionOp.union(
        java.util.Arrays.asList(geoms: _*))
    val centroid = union.getCentroid
    val env = union.getEnvelopeInternal
    val span = math.max(env.getMaxY - env.getMinY, env.getMaxX - env.getMinX)
    val viewZoom = if (span < 0.5) 11 else if (span < 1) 10 else if (span < 2) 9
      else if (span < 4) 8 else 7

    val cs = countries(spark, store)
    val isTarget = col("country_code") === countryCode
    val updated = cs
      .withColumn("country_boundary",
        when(isTarget, lit(Geo.toWkb(union))).otherwise(col("country_boundary")))
      .withColumn("center_lat",
        when(isTarget, coalesce(col("center_lat"), lit(centroid.getY))).otherwise(col("center_lat")))
      .withColumn("center_lon",
        when(isTarget, coalesce(col("center_lon"), lit(centroid.getX))).otherwise(col("center_lon")))
      .withColumn("view_zoom",
        when(isTarget, coalesce(col("view_zoom"), lit(viewZoom))).otherwise(col("view_zoom")))
    overwrite(store, updated, CountriesRel)
  }
}
