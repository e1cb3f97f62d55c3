package graft.ops

import graft.geo.Geo
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.index.strtree.STRtree

/**
 * Tile → admin-region assignment: the reference's 3-step overlay
 * (impact_analysis.py:990-1068, SURVEY.md J4-J6):
 *
 *   1. centroid-within:    tile centroid inside an admin polygon (first match)
 *   2. max-overlap-area:   largest intersection area (equal-area projected)
 *   3. nearest-neighbour:  closest admin polygon to the tile centroid
 *
 * Admin dimension tables are small (≤ thousands of polygons per country), so
 * all three steps run as a single broadcast pass: an STRtree over the admin
 * polygons is built once per executor thread; each tile resolves its admin id
 * in one narrow map — no shuffle, no cross join, scale-independent of the
 * tile count.
 */
object AdminOverlay {

  /**
   * @param tiles  (tile_id, geometry WKB, ...)
   * @param admins (id, geometry WKB) — admin polygons with their ucode id
   * @return tiles with an `id` column (admin assignment; null only if
   *         `admins` is empty)
   */
  def assign(tiles: DataFrame, admins: DataFrame,
             tileGeomCol: String = "geometry",
             adminGeomCol: String = "geometry",
             adminIdCol: String = "id"): DataFrame = {
    val spark = tiles.sparkSession
    val adminRows: Array[(String, Array[Byte])] = graft.util.Collects.boundedCollect(
        admins.select(col(adminIdCol).cast(StringType), col(adminGeomCol)),
        what = "AdminOverlay.assign admin side",
        alternative = "AdminOverlay.assignCentroidWithinLarge")
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val bc = spark.sparkContext.broadcast(adminRows)

    // Per-thread spatial index over the broadcast admin polygons.
    val tl = new graft.util.ThreadLocalCache[(STRtree, Array[(String, Geometry)])](() => {
      val geoms = bc.value.map { case (id, wkb) => (id, Geo.fromWkb(wkb)) }
      val tree = new STRtree()
      geoms.zipWithIndex.foreach { case ((_, g), i) => tree.insert(g.getEnvelopeInternal, Integer.valueOf(i)) }
      tree.build()
      (tree, geoms)
    })

    val assignUdf = udf { (tileWkb: Array[Byte]) =>
      if (tileWkb == null) null
      else {
        val (tree, geoms) = tl.get
        if (geoms.isEmpty) null
        else {
          val tile = Geo.fromWkb(tileWkb)
          val centroid = tile.getCentroid
          import scala.jdk.CollectionConverters._
          val cands = tree.query(tile.getEnvelopeInternal).asScala
            .map(_.asInstanceOf[Integer].intValue).toArray.sorted
          // step 1: centroid within (first match in admin order — matches the
          // reference's sjoin + drop_duplicates(keep='first'))
          val within = cands.find(i => geoms(i)._2.contains(centroid))
          within.map(i => geoms(i)._1).getOrElse {
            // step 2: max intersection area (equal-area projected)
            val overlaps = cands.iterator.map { i =>
              val inter = try geoms(i)._2.intersection(tile) catch { case _: Exception => null }
              val a = if (inter == null || inter.isEmpty) 0.0 else Geo.areaM2(inter)
              (i, a)
            }.filter(_._2 > 0).toArray
            if (overlaps.nonEmpty) geoms(overlaps.maxBy(_._2)._1)._1
            else {
              // step 3: nearest admin to the tile centroid
              var best = -1; var bestD = Double.MaxValue
              var i = 0
              while (i < geoms.length) {
                val d = geoms(i)._2.distance(centroid)
                if (d < bestD) { bestD = d; best = i }
                i += 1
              }
              if (best >= 0) geoms(best)._1 else null
            }
          }
        }
      }
    }
    tiles.withColumn("id", assignUdf(col(tileGeomCol)))
  }

  /**
   * Shuffle-based variant of step 1 for when the admin side is too big to
   * broadcast (J4 as a quadkey filter-refine join + W2 first-match window).
   * Kept for the 100 TB path; correctness-equivalent to step 1 of [[assign]].
   */
  def assignCentroidWithinLarge(tiles: DataFrame, admins: DataFrame, zoom: Int): DataFrame = {
    import graft.geo.GeoFunctions._
    val withCentroid = tiles.withColumn("__centroid", st_centroid(col("geometry")))
    val joined = SpatialJoin.quadkeyRefineJoin(
      withCentroid, "__centroid",
      admins.select(col("id").as("__admin_id"), col("geometry").as("__admin_geom")), "__admin_geom",
      zoom)
    val w = Window.partitionBy(col("tile_id")).orderBy(col("__admin_id"))
    joined
      .filter(st_within(col("__centroid"), col("__admin_geom")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("id", col("__admin_id"))
      .drop("__centroid", "__admin_id", "__admin_geom", "__rn")
  }
}
