package graft.pipeline

import graft.{Main, SparkSpec}
import graft.io.DataStore
import org.apache.spark.sql.functions._

/** End-to-end CLI test (reference main_pipeline.py:774-975): the synthetic
  * scenario staged into the `ingest/` layout, then driven ONLY through
  * `Main.run`/`Main.main` — initialize → update → idempotent re-run →
  * patch — asserting on the exit codes and the store the CLI leaves behind. */
class MainSpec extends SparkSpec {

  import spark.implicits._

  private val root = java.nio.file.Files.createTempDirectory("graft-main").toString
  private val store = new DataStore(root)
  private val storm = "MAINTEST"
  private val dateKey = "20260801000000"

  private def stageIngest(): Unit = if (!store.exists("ingest/SYN_tiles.parquet")) {
    val tiles = SyntheticScenario.tiles(spark, nx = 16, ny = 16)
    store.writeParquet(tiles, "ingest/SYN_tiles.parquet")
    store.writeParquet(SyntheticScenario.admins(spark, tiles), "ingest/SYN_admin1.parquet")
    store.writeParquet(
      SyntheticScenario.facilities(spark, "school", 40, nx = 16, ny = 16),
      "ingest/SYN_school.parquet")
    store.writeParquet(
      Seq((storm, java.sql.Timestamp.valueOf("2026-08-01 00:00:00")))
        .toDF("track_id", "forecast_time"),
      "ingest/storm_catalog.parquet")
    store.writeParquet(SyntheticScenario.envelopes(spark, members = 51),
      s"ingest/envelopes/${storm}_$dateKey.parquet")
    store.writeParquet(SyntheticScenario.tracks(spark, members = 20),
      s"ingest/tracks/${storm}_$dateKey.parquet")
  }

  test("argument parsing rejects bad flags with usage exit code 2") {
    assert(Main.run(Array("--type", "bogus")) == 2)
    assert(Main.run(Array("--zoom", "notanint")) == 2)
    assert(Main.run(Array("--no-such-flag")) == 2)
    assert(Main.parseArgs(Array("--type", "update", "--countries", "SYN", "ABC",
      "--date", "2026-08-01", "--time_delta", "5", "--rewrite", "1"))
      .exists(a => a.countries == Seq("SYN", "ABC") && a.rewrite &&
        a.timeDelta == 5 && a.date.contains("2026-08-01")))
  }

  test("initialize via Main builds base layers and registers the country") {
    stageIngest()
    assert(Main.run(Array("--type", "initialize", "--root", root,
      "--countries", "SYN", "--zoom", "14")) == 0)
    val base = store.readParquet(spark, "mercator_views/SYN_14.parquet")
    assert(base.count() == 256)
    assert(store.exists("admin_views/SYN_admin1.parquet"))
    assert(store.exists("school_views/SYN_school.parquet"))
    assert(CountryRegistry.activeCountries(spark, store) == Seq("SYN"))
    // second run without --rewrite skips (still exit 0)
    assert(Main.run(Array("--type", "initialize", "--root", root,
      "--countries", "SYN", "--zoom", "14")) == 0)
  }

  test("initialize fails loudly when ingest inputs are missing") {
    stageIngest()
    assert(Main.run(Array("--type", "initialize", "--root", root,
      "--countries", "NOPE", "--zoom", "14")) == 1)
  }

  test("update via Main processes the catalog storm for the registry countries") {
    stageIngest()
    Main.run(Array("--type", "initialize", "--root", root,
      "--countries", "SYN", "--zoom", "14"))
    // no --countries: must resolve SYN from the registry (Snowflake-first rule)
    assert(Main.run(Array("--type", "update", "--root", root,
      "--date", "2026-08-01", "--storm", storm)) == 0)
    assert(store.list("reports_json").exists(_.startsWith(s"SYN_${storm}_$dateKey")))
    assert(store.list("mercator_impact_views").exists(_.startsWith(s"SYN_${storm}_$dateKey")))
    // processed-state dedup: re-running the same forecast is a no-op success
    val filesBefore = Jobs.ViewDirs.map(d => store.list(d).size).sum
    assert(Main.run(Array("--type", "update", "--root", root,
      "--date", "2026-08-01", "--storm", storm)) == 0)
    assert(Jobs.ViewDirs.map(d => store.list(d).size).sum == filesBefore)
  }

  test("update --skip-analysis lists runnable storms without processing") {
    stageIngest()
    val tmp = java.nio.file.Files.createTempDirectory("graft-main-skip").toString
    val skipStore = new DataStore(tmp)
    skipStore.writeParquet(store.readParquet(spark, "ingest/storm_catalog.parquet"),
      "ingest/storm_catalog.parquet")
    assert(Main.run(Array("--type", "update", "--root", tmp,
      "--date", "2026-08-01", "--skip-analysis")) == 0)
    assert(!skipStore.exists("reports_json"))
  }

  test("patch via Main backfills a column and rejects unknown ones") {
    stageIngest()
    Main.run(Array("--type", "initialize", "--root", root,
      "--countries", "SYN", "--zoom", "14"))
    assert(Main.run(Array("--type", "patch", "--root", root,
      "--countries", "SYN")) == 1) // --columns required
    assert(Main.run(Array("--type", "patch", "--root", root,
      "--countries", "SYN", "--columns", "not_a_column")) == 1)
    val ids = store.readParquet(spark, "mercator_views/SYN_14.parquet")
      .select("tile_id").limit(50)
    store.writeParquet(ids.withColumn("rwi", lit(0.25)), "ingest/SYN_patch.parquet")
    assert(Main.run(Array("--type", "patch", "--root", root,
      "--countries", "SYN", "--columns", "rwi")) == 0)
    val patched = store.readParquet(spark, "mercator_views/SYN_14.parquet")
    assert(patched.filter(col("rwi") === 0.25).count() == 50)
  }
}
