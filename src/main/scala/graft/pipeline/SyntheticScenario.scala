package graft.pipeline

import graft.geo.{Geo, Quadkey}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic storm scenario used by the flagship `entry` query,
 * the golden end-to-end test, and the geo benchmark queries. Everything is a
 * pure function of (seed, sizes) — no RNG state, reproducible across JVMs.
 *
 * Layout mirrors the reference's data model (SURVEY.md §1.3): a quadkey tile
 * grid with demographic columns, point facilities, admin regions, and a
 * 51-member × multi-threshold envelope set whose envelopes are nested by
 * threshold (higher wind ⊂ lower wind), like real wind envelopes.
 */
object SyntheticScenario {

  /** Deterministic pseudo-random double in [0,1) from a long key. */
  private def unit(key: Long): Double =
    (graft.util.Hashing.mix64(key) >>> 11).toDouble / (1L << 53).toDouble

  /** Tile layer: `nx × ny` zoom-`zoom` tiles starting at a fixed anchor
    * quadkey, with the reference's demographic columns
    * (impact_analysis.py:101-114) filled deterministically. */
  def tiles(spark: SparkSession, zoom: Int = 14, nx: Int = 64, ny: Int = 64,
            anchorLon: Double = -72.0, anchorLat: Double = 18.5): DataFrame = {
    import spark.implicits._
    val (tx0, ty0) = Quadkey.lonLatToTileXY(anchorLon, anchorLat, zoom)
    val rows = for (dx <- 0 until nx; dy <- 0 until ny) yield {
      val tx = tx0 + dx; val ty = ty0 + dy
      val qk = Quadkey.tileXYToQuadkey(tx, ty, zoom)
      val k = tx.toLong * 100003L + ty
      val pop = math.floor(unit(k) * 2000)
      val school = math.floor(pop * 0.18)
      val infant = math.floor(pop * 0.09)
      val adolescent = math.floor(pop * 0.08)
      val built = math.floor(unit(k + 1) * 50000)
      val smodL2 = Seq(10, 11, 12, 13, 21, 22, 23, 30)((unit(k + 2) * 8).toInt)
      val smodL1 = Constants.SmodL2ToL1(smodL2)
      val rwi = unit(k + 3) * 3 - 1.5
      // num_wash deliberately all-null: exercises the "no data ≠ 0"
      // optional-sum path (impact_analysis.py:152-159)
      (qk, Geo.toWkb(Quadkey.quadkeyPolygon(qk)), pop, school, infant, adolescent,
        built, smodL2.toDouble, smodL1.toDouble, rwi,
        if (unit(k + 4) < 0.3) Some(math.floor(unit(k + 5) * 3)) else Some(0.0),
        if (unit(k + 6) < 0.2) Some(math.floor(unit(k + 7) * 2)) else Some(0.0),
        Option.empty[Double], Option.empty[Double])
    }
    rows.toDF("tile_id", "geometry", "population", "school_age_population",
      "infant_population", "adolescent_population", "built_surface_m2",
      "smod_class", "smod_class_l1", "rwi", "num_schools", "num_hcs",
      "num_shelters", "num_wash")
  }

  /** Admin regions: coarse quadkey blocks (zoom-`adminZoom` ancestors of the
    * tile grid) as admin polygons with ucode-style ids. */
  def admins(spark: SparkSession, tilesDf: DataFrame, adminZoom: Int = 11): DataFrame = {
    import spark.implicits._
    val spark2 = spark
    val prefixes = tilesDf.select(substring(col("tile_id"), 1, adminZoom).as("qk"))
      .distinct().as[String].collect().sorted
    prefixes.zipWithIndex.map { case (qk, i) =>
      (s"SYN_${i + 1}", s"Region ${i + 1}", Geo.toWkb(Quadkey.quadkeyPolygon(qk)))
    }.toSeq.toDF("id", "name", "geometry")
  }

  /** Point facilities inside the tile grid bbox. */
  def facilities(spark: SparkSession, kind: String, n: Int,
                 zoom: Int = 14, nx: Int = 64, ny: Int = 64,
                 anchorLon: Double = -72.0, anchorLat: Double = 18.5): DataFrame = {
    import spark.implicits._
    val (tx0, ty0) = Quadkey.lonLatToTileXY(anchorLon, anchorLat, zoom)
    val (minLon, minLat, _, _) = Quadkey.tileBounds(tx0, ty0 + ny, zoom)
    val (_, _, maxLon, maxLat) = Quadkey.tileBounds(tx0 + nx, ty0 - 1, zoom)
    val seed = graft.util.Hashing.fnv64(kind)
    (0 until n).map { i =>
      val lon = minLon + unit(seed + 2L * i) * (maxLon - minLon)
      val lat = minLat + unit(seed + 2L * i + 1) * (maxLat - minLat)
      (s"${kind}_$i", lon, lat, Geo.toWkb(Geo.point(lon, lat)))
    }.toDF(s"${kind}_id", "longitude", "latitude", "geometry")
  }

  /** Envelope set: `members` ensemble members × thresholds, nested by
    * threshold (envelope at threshold t_{i+1} ⊂ envelope at t_i), each a box
    * jittered per member around a shared storm track. */
  def envelopes(spark: SparkSession, members: Int = 51,
                thresholds: Seq[Int] = Constants.WindThresholds.take(5),
                anchorLon: Double = -72.0, anchorLat: Double = 18.5): DataFrame = {
    import spark.implicits._
    val sorted = thresholds.sorted
    val rows = for {
      m <- 1 to members
      (th, i) <- sorted.zipWithIndex
    } yield {
      val cLon = anchorLon + 0.35 + (unit(m * 7919L) - 0.5) * 0.3
      val cLat = anchorLat + 0.35 + (unit(m * 7919L + 1) - 0.5) * 0.3
      // halve the envelope span per threshold step: strictly nested
      val span = 0.45 / (1 << i)
      (m, th, Geo.toWkb(Geo.box(cLon - span, cLat - span, cLon + span, cLat + span)))
    }
    rows.toDF("ensemble_member", "wind_threshold", "geometry")
  }

  /** Per-member track points marching north-west over the grid. */
  def tracks(spark: SparkSession, members: Int = 51, points: Int = 12,
             anchorLon: Double = -72.0, anchorLat: Double = 18.5): DataFrame = {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    val rows = for (m <- 1 to members; p <- 0 until points) yield {
      val lon = anchorLon + 0.9 - 0.08 * p + (unit(m * 31L + p) - 0.5) * 0.05
      val lat = anchorLat - 0.2 + 0.07 * p + (unit(m * 37L + p) - 0.5) * 0.05
      val wind = 40 + 60 * unit(m * 41L + p)
      (m, new java.sql.Timestamp(t0.getTime + p * 6L * 3600 * 1000), p * 6,
        lat, lon, wind, 1005.0 - wind / 4, Geo.toWkb(Geo.point(lon, lat)))
    }
    rows.toDF("ensemble_member", "valid_time", "lead_time", "latitude",
      "longitude", "wind_speed_knots", "pressure_hpa", "geometry")
  }
}
