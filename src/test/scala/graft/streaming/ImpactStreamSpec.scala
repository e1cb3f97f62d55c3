package graft.streaming

import graft.SparkSpec
import graft.io.DataStore
import graft.pipeline.{Jobs, SyntheticScenario}
import org.apache.spark.sql.functions._

/** End-to-end: envelope drops on a watched directory drive the full
  * update pipeline, with checkpoint + processed-state double dedup. */
class ImpactStreamSpec extends SparkSpec {

  import spark.implicits._

  private val root = java.nio.file.Files.createTempDirectory("graft-istream").toString
  private val store = new DataStore(root)
  private val dropDir = java.nio.file.Files.createTempDirectory("graft-idrops").toString
  private val country = "SYN"
  private val zoom = 14

  private lazy val tiles = SyntheticScenario.tiles(spark, nx = 16, ny = 16)

  private def initOnce(): Unit =
    if (!store.exists(s"mercator_views/${country}_$zoom.parquet"))
      Jobs.initialize(spark, store, country, zoom, tiles,
        SyntheticScenario.admins(spark, tiles), Map(
          "school" -> SyntheticScenario.facilities(spark, "school", 40, nx = 16, ny = 16),
          "hc" -> SyntheticScenario.facilities(spark, "hc", 20, nx = 16, ny = 16)))

  private def drop(storm: String, date: String, n: String): Unit = {
    val envs = SyntheticScenario.envelopes(spark, members = 51)
      .withColumn("track_id", lit(storm))
      .withColumn("forecast_time", lit(date))
      .select("track_id", "forecast_time", "ensemble_member", "wind_threshold", "geometry")
    val staging = java.nio.file.Files.createTempDirectory("graft-istage").toString
    envs.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dropDir, s"$n.parquet"))
  }

  test("envelope drops drive the update pipeline with double dedup") {
    initOnce()

    // batch 1: one storm, one forecast
    drop("ALPHA", "20260801000000", "d1")
    val r1 = ImpactStream.runOnce(spark, store, dropDir, country, zoom)
    assert(r1.map(b => (b.storm, b.date, b.processed)) ==
      Seq(("ALPHA", "20260801000000", true)), r1.toString)
    assert(store.list("mercator_impact_views")
      .exists(_.startsWith(s"${country}_ALPHA_20260801000000_")))
    assert(Jobs.loadProcessed(store).contains(
      Jobs.processedKey("ALPHA", Seq(country), "20260801000000")))

    // batch 2: a NEW forecast plus a RE-DROP of the processed one (new file,
    // same key): checkpoint passes the new file through, Jobs.update's
    // processed-state check skips the replayed key
    drop("ALPHA", "20260801060000", "d2")
    drop("ALPHA", "20260801000000", "d3")
    val r2 = ImpactStream.runOnce(spark, store, dropDir, country, zoom)
    assert(r2.map(b => (b.date, b.processed)).toSet ==
      Set(("20260801000000", false), ("20260801060000", true)), r2.toString)
    assert(r2.find(_.date == "20260801000000").get.reason == "already-processed")

    // restart with nothing new: the checkpoint remembers all consumed files
    val r3 = ImpactStream.runOnce(spark, store, dropDir, country, zoom)
    assert(r3.isEmpty, r3.toString)
  }
}
