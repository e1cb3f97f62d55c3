package graft.io

import graft.geo.GeoFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Custom override CSV loaders (S10; reference impact_analysis.py:346-478,
 * custom_data/README.md). Two families:
 *
 *  - point kinds (schools / health_centers / shelters / wash):
 *    `id?, latitude, longitude, …attrs` — ids synthesized when missing,
 *    point geometry built from lon/lat;
 *  - tile kinds (population / built_surface / smod / rwi):
 *    `tile_id, value…` keyed by quadkey.
 *
 * Validation is fail-loud on missing required columns (the reference raises
 * ValueError; we throw IllegalArgumentException). Source-resolution priority
 * (custom > cache > API) is the caller's loader rule: [[resolve]].
 */
object CustomOverrides {

  val PointKinds: Map[String, Seq[String]] = Map(
    "schools" -> Seq("latitude", "longitude"),
    "health_centers" -> Seq("latitude", "longitude"),
    "shelters" -> Seq("latitude", "longitude"),
    "wash" -> Seq("latitude", "longitude"))

  val TileKinds: Map[String, Seq[String]] = Map(
    "population" -> Seq("tile_id", "population"),
    "built_surface" -> Seq("tile_id", "built_surface_m2"),
    "smod" -> Seq("tile_id", "smod_class"),
    "rwi" -> Seq("tile_id", "rwi"))

  def validate(df: DataFrame, required: Seq[String], what: String): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"custom $what CSV missing required column(s): ${missing.mkString(", ")}")
    df
  }

  /** Load a point-kind override: validate, synthesize stable ids when the id
    * column is absent (row-hash — deterministic, unlike
    * monotonically_increasing_id), build point geometry. */
  def loadPoints(spark: SparkSession, path: String, kind: String,
                 idCol: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val df = validate(raw, PointKinds(kind), kind)
    val withId =
      if (df.columns.contains(idCol)) df
      else df.withColumn(idCol,
        concat(lit(s"custom_${kind}_"),
          xxhash64(concat_ws("|", df.columns.map(col).toIndexedSeq: _*))))
    withId
      .withColumn("latitude", col("latitude").cast("double"))
      .withColumn("longitude", col("longitude").cast("double"))
      .na.drop(Seq("latitude", "longitude"))
      .withColumn("geometry", st_point(col("longitude"), col("latitude")))
  }

  /** Load a tile-kind override keyed by quadkey tile_id. */
  def loadTiles(spark: SparkSession, path: String, kind: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    validate(raw, TileKinds(kind), kind)
      .withColumn("tile_id", col("tile_id").cast("string"))
  }

  /** Source resolution (impact_analysis.py:484-704): custom > cache > fetch. */
  def resolve(custom: => Option[DataFrame], cache: => Option[DataFrame],
              fetch: => Option[DataFrame]): Option[DataFrame] =
    custom.orElse(cache).orElse(fetch)
}
