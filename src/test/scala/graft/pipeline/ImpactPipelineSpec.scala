package graft.pipeline

import graft.SparkSpec
import graft.geo.Geo
import graft.ops.SpatialJoin
import org.apache.spark.sql.functions._

/** End-to-end golden test on the deterministic synthetic storm scenario. */
class ImpactPipelineSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tiles = SyntheticScenario.tiles(spark, nx = 16, ny = 16).cache()
  private lazy val envs = SyntheticScenario.envelopes(spark, members = 51).cache()
  private lazy val tv = ImpactPipeline.tileView(tiles, envs).cache()

  test("tile view: complete grid × thresholds, probability in [0,1], E = col*p") {
    val nTiles = tiles.count()
    val nTh = envs.select("wind_threshold").distinct().count()
    assert(tv.count() == nTiles * nTh)
    val bad = tv.filter(col("probability") < 0 || col("probability") > 1).count()
    assert(bad == 0)
    // spot-check E_population = population * probability on a joined sample
    val joined = tv.join(tiles.select(col("tile_id").as("zone_id"), col("population")), "zone_id")
      .select(abs(col("E_population") - col("population") * col("probability")).as("err"))
      .agg(max("err")).as[Double].head()
    assert(joined < 1e-9)
  }

  test("probability = intersect count / 51 independent of observed members") {
    val probs = tv.select("probability").distinct().as[Double].collect()
    probs.foreach { p =>
      val scaled = p * 51
      assert(math.abs(scaled - math.round(scaled)) < 1e-9, s"p=$p not a /51 multiple")
    }
  }

  test("monotone nesting: higher threshold never has higher probability") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("zone_id").orderBy("wind_threshold")
    val violations = tv
      .withColumn("next_p", lead(col("probability"), 1).over(w))
      .filter(col("next_p").isNotNull && col("next_p") > col("probability"))
      .count()
    // synthetic envelopes are strictly nested by construction
    assert(violations == 0)
  }

  test("optional-sum semantics survive the admin rollup (num_wash all null)") {
    val admins = SyntheticScenario.admins(spark, tiles)
    val assigned = graft.ops.AdminOverlay.assign(tiles, admins)
    val av = ImpactPipeline.adminView(tv, assigned.select("tile_id", "id"), admins)
    assert(av.filter(col("E_num_wash").isNotNull).count() == 0)
    assert(av.filter(col("E_population").isNotNull).count() > 0)
    assert(av.filter(col("name").isNull).count() == 0)
    // admin sums = tile sums (conservation) per threshold
    val tileTotal = tv.groupBy("wind_threshold").agg(sum("E_population").as("t"))
    val adminTotal = av.groupBy("wind_threshold").agg(sum("E_population").as("a"))
    val diff = tileTotal.join(adminTotal, "wind_threshold")
      .select(abs(col("t") - col("a")).as("d")).agg(max("d")).as[Double].head()
    assert(diff < 1e-6)
  }

  test("facility view keeps all facilities at every threshold with attributes") {
    val schools = SyntheticScenario.facilities(spark, "school", 40, nx = 16, ny = 16)
    val fv = ImpactPipeline.facilityView(schools, envs, "school_id")
    val nTh = envs.select("wind_threshold").distinct().count()
    assert(fv.count() == 40 * nTh)
    assert(fv.columns.contains("longitude") && fv.columns.contains("probability"))
  }

  test("track view: per (threshold, member) severity with null shelter/wash when absent") {
    val schools = SyntheticScenario.facilities(spark, "school", 40, nx = 16, ny = 16)
    val hcs = SyntheticScenario.facilities(spark, "hc", 20, nx = 16, ny = 16)
    val envsSmall = SyntheticScenario.envelopes(spark, members = 5)
    val tvw = ImpactPipeline.trackView(envsSmall, schools, hcs, None, None, tiles)
    val nTh = envsSmall.select("wind_threshold").distinct().count()
    assert(tvw.count() == 5 * nTh)
    assert(tvw.filter(col("severity_num_shelters").isNotNull).count() == 0)
    assert(tvw.columns.contains("severity_population"))
    // severity_schools <= total schools
    assert(tvw.agg(max("severity_schools")).as[Long].head() <= 40)
  }

  test("CCI views: rollup conserves tile CCI sums") {
    val admins = SyntheticScenario.admins(spark, tiles)
    val assigned = graft.ops.AdminOverlay.assign(tiles, admins)
    val (cciTiles, cciAdmin) = ImpactPipeline.cciViews(tv, assigned)
    val tileSum = cciTiles.agg(sum("CCI_pop")).as[Double].head()
    val adminSum = cciAdmin.agg(sum("CCI_pop")).as[Double].head()
    assert(math.abs(tileSum - adminSum) < 1e-6)
    // CCI_pop >= 0 everywhere (monotone nested envelopes, nonneg pops)
    assert(cciTiles.filter(col("CCI_pop") < -1e-9).count() == 0)
  }

  test("sum(E_x) <= sum(x) (probability <= 1)") {
    val sumE = tv.agg(sum("E_population")).as[Double].head()
    val sumX = tiles.agg(sum("population")).as[Double].head()
    val nTh = envs.select("wind_threshold").distinct().count()
    assert(sumE <= sumX * nTh + 1e-6)
  }
}
