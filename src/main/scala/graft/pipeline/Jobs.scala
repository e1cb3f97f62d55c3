package graft.pipeline

import graft.io.DataStore
import graft.ops.{AdminOverlay, Aggregations, Cci}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The three pipeline entry modes (reference main_pipeline.py:816-828):
 * initialize (build base layers), update (process a storm forecast), patch
 * (backfill columns). Each is a deterministic job graph over a [[DataStore]]
 * following the reference's directory layout (FILE_STRUCTURE.md).
 *
 * Incremental semantics (SURVEY.md §2.8): processed-state is a JSON file of
 * "(storm|countries, forecast_time)" keys (storms.json,
 * impact_analysis.py:1590-1606); update() skips already-processed keys
 * unless rewrite=true (J13 anti-join dedup), deletes stale outputs by
 * filename prefix before rewriting (S15), and appends a run-log row after
 * each storm (S16 analogue).
 */
object Jobs {

  val ViewDirs = Seq("school_views", "hc_views", "shelter_views", "wash_views",
    "mercator_impact_views", "admin_impact_views", "track_views", "reports_json")

  // --- processed-state (S14) --------------------------------------------

  def loadProcessed(store: DataStore): Map[String, Any] =
    if (store.exists("storms.json")) Reports.fromJson(store.readText("storms.json"))
    else Map.empty

  def saveProcessed(store: DataStore, processed: Map[String, Any]): Unit =
    store.writeText("storms.json", Reports.toJson(processed))

  def processedKey(storm: String, countries: Seq[String], date: String): String =
    s"$storm|${countries.sorted.mkString(",")}|$date"

  // --- run log (S16) -----------------------------------------------------

  def appendRunLog(store: DataStore, spark: SparkSession, storm: String, date: String,
                   status: String, runtimeSeconds: Double): Unit = {
    import spark.implicits._
    val row = Seq((storm, date, status, runtimeSeconds,
      java.time.Instant.now().toString)).toDF(
      "storm", "forecast_time", "status", "runtime_seconds", "logged_at")
    row.write.mode("append").parquet(store.path("run_log"))
  }

  // --- initialize --------------------------------------------------------

  /**
   * Build and persist the base layers for a country
   * (main_pipeline.py:384-419 → impact_analysis.py:1505-1584): the mercator
   * tile layer with admin ids, per-level admin rollups, and facility caches.
   */
  def initialize(spark: SparkSession, store: DataStore, country: String, zoom: Int,
                 tiles: DataFrame, admins: DataFrame,
                 facilities: Map[String, DataFrame],
                 extraAdminLevels: Map[Int, DataFrame] = Map.empty): Unit = {
    val withIds = AdminOverlay.assign(
      Aggregations.nanToNull(tiles, Constants.TileDataCols), admins)
    store.writeParquet(withIds, s"mercator_views/${country}_$zoom.parquet")

    // admin rollup (impact_analysis.py:1469-1502): sums + means keyed by the
    // admin ucode in a column *named* tile_id (reference naming quirk)
    val rolled = Aggregations.adminRollup(withIds.drop("tile_id", "geometry"), "id")
      .withColumnRenamed("id", "tile_id")
      .join(broadcast(admins.select(col("id").as("tile_id"), col("name"), col("geometry"))),
        Seq("tile_id"), "left")
    store.writeParquet(rolled, s"admin_views/${country}_admin1.parquet")

    facilities.foreach { case (kind, df) =>
      store.writeParquet(df, s"${kind}_views/${country}_$kind.parquet")
    }
    extraAdminLevels.foreach { case (level, boundaries) =>
      initializeAdminLevel(spark, store, country, zoom, level, boundaries)
    }
  }

  /**
   * Build + persist the base admin{level} layer from the existing mercator
   * view (create_admin_country_layer; also the patch-mode on-request
   * creation, impact_analysis.py:1456-1466): overlay the tiles onto the
   * level's boundaries, roll up, attach names + geometry. Levels other than
   * 1 store their own tile→region assignment implicitly via the boundary
   * geometries; `update` re-derives it per level.
   */
  def initializeAdminLevel(spark: SparkSession, store: DataStore, country: String,
                           zoom: Int, level: Int, adminBoundaries: DataFrame): Unit = {
    require(level >= 1 && level <= 5, s"admin level $level outside 1..5")
    val base = store.readParquet(spark, s"mercator_views/${country}_$zoom.parquet")
    val withIds =
      if (level == 1) base // the mercator parquet already carries admin1 ids
      else AdminOverlay.assign(base.drop("id"), adminBoundaries)
    if (level != 1) {
      // persist the storm-independent tile→region mapping so each storm
      // update reads it instead of re-running the overlay over every tile
      store.writeParquet(withIds.select("tile_id", "id"),
        s"admin_views/${country}_admin${level}_tile_map.parquet")
    }
    val rolled = Aggregations.adminRollup(withIds.drop("tile_id", "geometry"), "id")
      .withColumnRenamed("id", "tile_id")
      .join(broadcast(adminBoundaries.select(col("id").as("tile_id"), col("name"), col("geometry"))),
        Seq("tile_id"), "left")
    store.writeParquet(rolled, s"admin_views/${country}_admin$level.parquet")
  }

  /** Admin levels with an initialized base parquet — these determine which
    * per-level storm views `update` produces
    * (get_initialized_admin_levels, impact_analysis.py:1123-1142). */
  def initializedAdminLevels(store: DataStore, country: String): Seq[Int] =
    (1 to 5).filter(l => store.exists(s"admin_views/${country}_admin$l.parquet"))

  case class UpdateResult(processed: Boolean, reason: String,
                          report: Map[String, Any] = Map.empty)

  // --- update ------------------------------------------------------------

  /**
   * Process one (storm, forecast) for one country
   * (impact_analysis.py:2757-2933): all views + CCI + report, with
   * prefix cleanup, processed-state dedup and run logging.
   */
  /** @param viewFormat "csv" (default — the reference's single-file-per-view
    *                    contract) or "parquet" (partitioned, multi-writer:
    *                    the at-scale layout; same directory/name scheme with
    *                    a .parquet extension) */
  def update(spark: SparkSession, store: DataStore, country: String, zoom: Int,
             storm: String, date: String,
             envelopes: DataFrame, tracks: Option[DataFrame],
             countryBoundaryWkb: Option[Array[Byte]] = None,
             rewrite: Boolean = false, viewFormat: String = "csv"): UpdateResult = {
    require(viewFormat == "csv" || viewFormat == "parquet",
      s"viewFormat must be csv or parquet, got $viewFormat")
    val vext = viewFormat
    def fanoutViews(df: DataFrame, dir: String, name: String => String): Unit =
      if (viewFormat == "csv") { store.writePartitionedCsv(df, dir, "wind_threshold", name); () }
      else { store.writePartitionedParquet(df, dir, "wind_threshold", name); () }
    def singleView(df: DataFrame, rel: String): Unit =
      if (viewFormat == "csv") store.writeSingleCsv(df, rel)
      else store.writeParquet(df, rel)
    val t0 = System.nanoTime()
    val key = processedKey(storm, Seq(country), date)
    val processed = loadProcessed(store)
    if (!rewrite && processed.contains(key))
      return UpdateResult(processed = false, reason = "already-processed")

    if (envelopes.isEmpty)
      return UpdateResult(processed = false, reason = "no-envelopes")

    val prefix = s"${country}_${storm}_${date}_"
    store.removeByPrefix(ViewDirs, prefix)

    val tiles = store.readParquet(spark, s"mercator_views/${country}_$zoom.parquet").cache()
    val admins = store.readParquet(spark, s"admin_views/${country}_admin1.parquet")
      .select(col("tile_id").as("id"), col("name"), col("geometry"))

    // tile view + per-threshold CSVs (S9 layout: one per threshold) — one
    // partitionBy pass fans out all thresholds (SURVEY.md §7.4)
    val tv = ImpactPipeline.tileView(tiles, envelopes).cache()
    fanoutViews(tv, "mercator_impact_views", th => s"$prefix${th}_$zoom.$vext")

    // facility views ×4 (only kinds with a cached layer)
    val facilityViews: Map[String, Option[DataFrame]] =
      Seq("school" -> "school_id", "hc" -> "hc_id", "shelter" -> "shelter_id", "wash" -> "wash_id")
        .map { case (kind, idCol) =>
          val rel = s"${kind}_views/${country}_$kind.parquet"
          kind -> (if (store.exists(rel)) {
            val fv = ImpactPipeline.facilityView(store.readParquet(spark, rel), envelopes, idCol)
            // one partitionBy pass fans out every threshold (S9 layout)
            store.writePartitionedParquet(fv.drop("geometry"), s"${kind}_views",
              "wind_threshold", th => s"$prefix$th.parquet")
            Some(fv)
          } else None)
        }.toMap

    // admin views + CCIs — one pass per initialized admin level
    // (impact_analysis.py:2868-2907): level 1 reuses the admin ids already
    // on the tiles; deeper levels re-overlay against the level's stored
    // boundaries — no external lookup, mirroring the reference's reuse of
    // the admin parquet's geometries.
    val (cciTiles, cciAdmin) = ImpactPipeline.cciViews(tv, tiles)
    singleView(cciTiles, s"mercator_impact_views/$prefix${zoom}_cci.$vext")

    val levels = initializedAdminLevels(store, country) match {
      case Seq() => Seq(1)
      case ls => ls
    }
    var av: DataFrame = null // level-1 view doubles as the report input
    levels.foreach { level =>
      val adminsN = if (level == 1) admins
        else store.readParquet(spark, s"admin_views/${country}_admin$level.parquet")
          .select(col("tile_id").as("id"), col("name"), col("geometry"))
      val mapRel = s"admin_views/${country}_admin${level}_tile_map.parquet"
      val tileIds = if (level == 1) tiles.select("tile_id", "id")
        else if (store.exists(mapRel)) store.readParquet(spark, mapRel) // precomputed at init
        else AdminOverlay.assign(tiles.select("tile_id", "geometry"), adminsN)
          .select("tile_id", "id")
      val avN = ImpactPipeline.adminView(
        if (level == 1) tv else tv.drop("id"), tileIds, adminsN)
      fanoutViews(avN.drop("geometry"), "admin_impact_views",
        th => s"$prefix${th}_admin$level.$vext")
      val cciAdminN = if (level == 1) cciAdmin
        else Cci.adminRollup(cciTiles.drop("id").join(
          broadcast(tileIds.withColumnRenamed("tile_id", "zone_id")), Seq("zone_id"), "left"))
      singleView(cciAdminN, s"admin_impact_views/${prefix}admin${level}_cci.$vext")
      if (level == 1) av = avN.cache()
    }
    // the JSON report always reads the admin1 view, even when level 1 is not
    // among the initialized levels (impact_analysis.py:2909-2914)
    if (av == null)
      av = ImpactPipeline.adminView(tv, tiles.select("tile_id", "id"), admins).cache()

    // track view
    (facilityViews("school"), facilityViews("hc")) match {
      case (Some(_), Some(_)) =>
        val schools = store.readParquet(spark, s"school_views/${country}_school.parquet")
        val hcs = store.readParquet(spark, s"hc_views/${country}_hc.parquet")
        val shelters = if (store.exists(s"shelter_views/${country}_shelter.parquet"))
          Some(store.readParquet(spark, s"shelter_views/${country}_shelter.parquet")) else None
        val wash = if (store.exists(s"wash_views/${country}_wash.parquet"))
          Some(store.readParquet(spark, s"wash_views/${country}_wash.parquet")) else None
        val trackView = ImpactPipeline.trackView(envelopes, schools, hcs, shelters, wash, tiles)
        trackView.write.mode("overwrite").parquet(store.path(s"track_views/${prefix}tracks.parquet"))
      case _ => ()
    }

    // report with as-of previous (J15)
    val prevDate = Reports.previousDate(date)
    val prevRel = s"reports_json/${country}_${storm}_$prevDate.json"
    val previous = if (store.exists(prevRel)) Reports.fromJson(store.readText(prevRel)) else Map.empty[String, Any]
    val adminNames = admins.select("id", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val report = Reports.doReport(
      tv, av, facilityViews("school"), facilityViews("hc"),
      facilityViews("shelter"), facilityViews("wash"),
      cciTiles, cciAdmin, adminNames, tracks, countryBoundaryWkb,
      country, storm, date, previous)
    if (report.nonEmpty)
      store.writeText(s"reports_json/$prefix.json".replace("_.json", ".json"),
        Reports.toJson(report))

    saveProcessed(store, processed + (key -> date))
    appendRunLog(store, spark, storm, date, "SUCCESS", (System.nanoTime() - t0) / 1e9)
    tiles.unpersist(); tv.unpersist(); av.unpersist()
    UpdateResult(processed = true, reason = "ok", report = report)
  }

  // --- patch -------------------------------------------------------------

  /**
   * Backfill/overwrite tile columns on the base layer
   * (impact_analysis.py:1189-1466): join new per-tile values on tile_id with
   * coalesce(new, old), rewrite the base parquet, re-aggregate admin views.
   */
  def patch(spark: SparkSession, store: DataStore, country: String, zoom: Int,
            columnValues: DataFrame /* tile_id + columns to patch */): Unit = {
    val base = store.readParquet(spark, s"mercator_views/${country}_$zoom.parquet")
    val patchCols = columnValues.columns.filterNot(_ == "tile_id")
    val renamed = patchCols.foldLeft(columnValues) { (d, c) => d.withColumnRenamed(c, s"__new_$c") }
    val joined = base.join(renamed, Seq("tile_id"), "left")
    val patched = patchCols.foldLeft(joined) { (d, c) =>
      (if (d.columns.contains(c)) d.withColumn(c, coalesce(col(s"__new_$c"), col(c)))
       else d.withColumn(c, col(s"__new_$c"))).drop(s"__new_$c")
    }
    val out = patched.cache()
    out.count() // materialize before overwriting the file being read
    val tmp = s"mercator_views/${country}_$zoom.parquet.__tmp__"
    store.writeParquet(out, tmp)
    store.remove(s"mercator_views/${country}_$zoom.parquet")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(store.path(tmp)),
      java.nio.file.Paths.get(store.path(s"mercator_views/${country}_$zoom.parquet")))

    // re-aggregate every initialized admin view (impact_analysis.py:1421-1454)
    initializedAdminLevels(store, country).foreach { level =>
      val adminRel = s"admin_views/${country}_admin$level.parquet"
      val adminsGeom = store.readParquet(spark, adminRel).select("tile_id", "name", "geometry")
      val refreshed = store.readParquet(spark, s"mercator_views/${country}_$zoom.parquet")
      val withIds = if (level == 1) refreshed
        else AdminOverlay.assign(refreshed.drop("id"),
          adminsGeom.select(col("tile_id").as("id"), col("geometry")))
      val rolled = Aggregations.adminRollup(withIds.drop("tile_id", "geometry"), "id")
        .withColumnRenamed("id", "tile_id")
        .join(broadcast(adminsGeom), Seq("tile_id"), "left")
      val tmpA = adminRel + ".__tmp__"
      store.writeParquet(rolled, tmpA)
      store.remove(adminRel)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(store.path(tmpA)),
        java.nio.file.Paths.get(store.path(adminRel)))
    }
    out.unpersist()
  }
}
