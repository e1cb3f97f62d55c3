package graft.pipeline

import graft.geo.{Geo, Quadkey}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed tile-universe generation (the reference's
 * MercatorViewGenerator, impact_analysis.py:808 — but built with
 * `spark.range`, so a country's 10^4–10^6 zoom-14 tiles (or a continent's
 * 10^8) are generated in parallel on executors, never on the driver).
 */
object TileUniverse {

  /**
   * All zoom-`zoom` tiles covering a lon/lat bbox, with WKB geometry and
   * deterministic synthetic demographics (same formulas as
   * [[SyntheticScenario.tiles]]). Partitioned by the range — spatially
   * contiguous runs of tiles land in the same partition (x-major order),
   * approximating quadkey-prefix locality.
   */
  def generate(spark: SparkSession, zoom: Int,
               minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
               withDemographics: Boolean = true): DataFrame = {
    val (tx0, ty1) = Quadkey.lonLatToTileXY(minLon, minLat, zoom) // y grows south
    val (tx1, ty0) = Quadkey.lonLatToTileXY(maxLon, maxLat, zoom)
    val nx = tx1 - tx0 + 1
    val ny = ty1 - ty0 + 1
    val gen = udf { (i: Long) =>
      val tx = tx0 + (i % nx).toInt
      val ty = ty0 + (i / nx).toInt
      val qk = Quadkey.tileXYToQuadkey(tx, ty, zoom)
      (qk, Geo.toWkb(Quadkey.quadkeyPolygon(qk)), tx.toLong * 100003L + ty)
    }
    val base = spark.range(nx.toLong * ny)
      .withColumn("__t", gen(col("id")))
      .select(col("__t._1").as("tile_id"), col("__t._2").as("geometry"),
        col("__t._3").as("__k"))
    if (!withDemographics) base.drop("__k")
    else {
      def unit(shift: Int) = {
        // same mix64-based uniform as SyntheticScenario.unit
        val mixed = udf { (k: Long) =>
          (graft.util.Hashing.mix64(k + shift) >>> 11).toDouble / (1L << 53).toDouble
        }
        mixed(col("__k"))
      }
      base
        .withColumn("population", floor(unit(0) * 2000).cast("double"))
        .withColumn("school_age_population", floor(col("population") * 0.18))
        .withColumn("infant_population", floor(col("population") * 0.09))
        .withColumn("adolescent_population", floor(col("population") * 0.08))
        .withColumn("built_surface_m2", floor(unit(1) * 50000).cast("double"))
        .withColumn("smod_class",
          element_at(typedlit(Seq(10, 11, 12, 13, 21, 22, 23, 30)), (unit(2) * 8).cast("int") + 1).cast("double"))
        .withColumn("smod_class_l1", graft.ops.Ingest.smodL1(col("smod_class")).cast("double"))
        .withColumn("rwi", unit(3) * 3 - 1.5)
        .withColumn("num_schools", when(unit(4) < 0.3, floor(unit(5) * 3)).otherwise(0.0))
        .withColumn("num_hcs", when(unit(6) < 0.2, floor(unit(7) * 2)).otherwise(0.0))
        .withColumn("num_shelters", lit(null).cast("double"))
        .withColumn("num_wash", lit(null).cast("double"))
        .drop("__k")
    }
  }
}
