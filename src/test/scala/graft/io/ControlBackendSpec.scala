package graft.io

import graft.SparkSpec
import graft.pipeline.{CountryRegistry, Orchestrator}
import org.apache.spark.sql.functions._

/**
 * The control-table CONTRACT, run identically over BOTH backends: the
 * parquet default and the JDBC warehouse seam (in-process embedded Derby
 * — the same `spark.read/write.jdbc` path a remote warehouse URL would
 * take). One suite, two backends: registry add/activate/mark-initialized
 * round-trips, completion-log append/read-latest with its array columns,
 * and empty-table reads.
 */
class ControlBackendSpec extends SparkSpec {

  private def parquetStore(): DataStore =
    new DataStore(java.nio.file.Files.createTempDirectory("cb-parquet").toString)

  private def jdbcStore(): DataStore = {
    val dir = java.nio.file.Files.createTempDirectory("cb-derby")
    // keep derby.log out of the repo/CWD
    System.setProperty("derby.system.home", dir.toString)
    val url = s"jdbc:derby:$dir/controldb;create=true"
    new DataStore(dir.toString,
      Some(new JdbcControlBackend(url, "org.apache.derby.jdbc.EmbeddedDriver")))
  }

  private def backends: Seq[(String, () => DataStore)] =
    Seq("parquet" -> (() => parquetStore()), "jdbc" -> (() => jdbcStore()))

  backends.foreach { case (name, mk) =>

    test(s"[$name] absent control tables read as empty frames with the declared schema") {
      val store = mk()
      val cs = CountryRegistry.countries(spark, store)
      assert(cs.count() == 0)
      assert(cs.schema == CountryRegistry.countriesSchema)
      val log = Orchestrator.readCompletionLog(spark, store)
      assert(log.count() == 0)
      assert(log.schema.fieldNames.toSeq == Orchestrator.completionLogSchema.fieldNames.toSeq)
    }

    test(s"[$name] registry round-trip: add, duplicate-reject, activate list, mark initialized") {
      val store = mk()
      assert(CountryRegistry.addCountry(spark, store, "MOZ", Some("Mozambique")))
      assert(CountryRegistry.addCountry(spark, store, "FJI", Some("Fiji"), zoomLevel = 12))
      assert(!CountryRegistry.addCountry(spark, store, "MOZ"),
        "second add of the same code must be a no-op")
      assert(CountryRegistry.activeCountries(spark, store) == Seq("FJI", "MOZ"))

      CountryRegistry.markInitialized(spark, store, "FJI", Some(12),
        now = "2026-08-15T00:00:00Z")
      val zl = CountryRegistry.zoomLevels(spark, store).collect()
      assert(zl.length == 1 && zl.head.getString(0) == "FJI" &&
        zl.head.getInt(1) == 12 && zl.head.getString(2) == "2026-08-15T00:00:00Z")
      val cs = CountryRegistry.countries(spark, store)
        .filter(col("country_code") === "FJI")
        .select("last_initialized").collect()
      assert(cs.head.getString(0) == "2026-08-15T00:00:00Z")
      // re-marking the same (country, zoom) upserts, not duplicates
      CountryRegistry.markInitialized(spark, store, "FJI", Some(12),
        now = "2026-08-16T00:00:00Z")
      assert(CountryRegistry.zoomLevels(spark, store).count() == 1)
    }

    test(s"[$name] completion log: appends accumulate, arrays survive, latest by logged_at") {
      val store = mk()
      Orchestrator.appendCompletionLog(spark, store,
        Seq("AL012026", "EP022026"), Seq("MOZ"), filesWritten = 7,
        runtimeSeconds = 1.5)
      Orchestrator.appendCompletionLog(spark, store,
        Seq("WP032026"), Seq("FJI", "PHL"), filesWritten = 3,
        runtimeSeconds = 0.5)
      val log = Orchestrator.readCompletionLog(spark, store)
      assert(log.count() == 2)
      val latest = log.orderBy(col("logged_at").desc).limit(1).collect().head
      assert(latest.getSeq[String](0) == Seq("WP032026"))
      assert(latest.getSeq[String](1) == Seq("FJI", "PHL"))
      assert(latest.getInt(2) == 3 && latest.getString(3) == "SUCCESS")
    }
  }

  test("[jdbc] replace is read-safe: the upsert reads the table it overwrites") {
    // the self-overwrite hazard: addCountry reads `countries`, unions a
    // row, and replaces the SAME table — the backend must materialize
    // before dropping (a lazy plan would scan a dropped table)
    val store = jdbcStore()
    (1 to 5).foreach { i =>
      assert(CountryRegistry.addCountry(spark, store, f"C$i%02d"))
    }
    assert(CountryRegistry.activeCountries(spark, store) ==
      (1 to 5).map(i => f"C$i%02d"))
  }
}
