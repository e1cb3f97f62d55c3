package graft.pipeline

import graft.io.DataStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Top-level `update` orchestration (reference main_pipeline.py:556-767,
 * update_storms): storm-catalog scan → target/date/recency filters →
 * already-processed dedup → per-(storm, forecast) fan-out over countries →
 * completion signal.
 *
 * The catalog filter is a declarative DataFrame pipeline (S4 + F3) so
 * predicate pushdown reaches a big catalog scan; only the surviving
 * (storm, forecast) keys — days' worth of forecasts, dozens of rows — are
 * collected to drive the per-storm loop. The heavy lifting stays inside
 * [[Jobs.update]], which is fully distributed.
 */
object Orchestrator {

  /** One runnable (storm, forecast) unit from the catalog. */
  case class StormRun(storm: String, date: String)

  case class UpdateStats(processed: Seq[StormRun] = Nil,
                         skipped: Seq[(StormRun, String)] = Nil,
                         countriesProcessed: Int = 0,
                         filesWritten: Int = 0,
                         errors: Seq[String] = Nil)

  /**
   * Filter the storm catalog to the runnable set
   * (main_pipeline.py:612-652): optional exact-date filter (overrides the
   * recency window), optional storm filter, else forecasts from the last
   * `timeDeltaDays` days. Expects columns `track_id` and `forecast_time`
   * (timestamp); emits one row per distinct (track_id, forecast key) with
   * the reference's compact `yyyyMMddHHmmss` key.
   */
  def selectStorms(catalog: DataFrame, timeDeltaDays: Int,
                   today: java.time.LocalDate,
                   targetDate: Option[String] = None,
                   targetStorm: Option[String] = None): DataFrame = {
    val base = catalog
      .withColumn("__date", to_date(col("forecast_time")))
      .withColumn("__key", date_format(col("forecast_time"), "yyyyMMddHHmmss"))
    val dated = targetDate match {
      case Some(d) => base.filter(col("__date") === to_date(lit(d)))
      case None => base.filter(
        datediff(lit(java.sql.Date.valueOf(today)), col("__date")) < timeDeltaDays)
    }
    val stormed = targetStorm match {
      case Some(s) => dated.filter(col("track_id") === s)
      case None => dated
    }
    stormed.select(col("track_id").as("storm"), col("__key").as("date"))
      .distinct().orderBy("storm", "date")
  }

  /**
   * Run [[Jobs.update]] for every runnable (storm, forecast) × country
   * (main_pipeline.py:634-741). `envelopesFor`/`tracksFor` supply the
   * per-storm inputs (the reference's warehouse reads); already-processed
   * keys are skipped inside Jobs.update unless `rewrite`. Appends the batch
   * completion signal when ≥ 1 storm processed.
   */
  def updateStorms(spark: SparkSession, store: DataStore,
                   catalog: DataFrame, countries: Seq[String], zoom: Int,
                   envelopesFor: (String, String, String) => DataFrame,
                   tracksFor: (String, String) => Option[DataFrame] = (_, _) => None,
                   boundaryFor: String => Option[Array[Byte]] = _ => None,
                   rewrite: Boolean = false, timeDeltaDays: Int = 2,
                   targetDate: Option[String] = None,
                   targetStorm: Option[String] = None,
                   today: java.time.LocalDate = java.time.LocalDate.now()): UpdateStats = {
    require(countries.nonEmpty, "no countries specified — nothing to process")
    val t0 = System.nanoTime()
    val runs = graft.util.Collects.boundedCollect(
      selectStorms(catalog, timeDeltaDays, today, targetDate, targetStorm),
      what = "updateStorms storm selection",
      alternative = "a narrower timeDeltaDays / targetDate window")
      .map(r => StormRun(r.getString(0), r.getString(1)))

    var stats = UpdateStats()
    val completedStorms = scala.collection.mutable.LinkedHashSet.empty[String]
    val completedCountries = scala.collection.mutable.LinkedHashSet.empty[String]

    runs.foreach { run =>
      countries.foreach { country =>
        try {
          val envs = envelopesFor(country, run.storm, run.date)
          val result = Jobs.update(spark, store, country, zoom, run.storm, run.date,
            envs, tracksFor(run.storm, run.date), boundaryFor(country), rewrite)
          if (result.processed) {
            val prefix = s"${country}_${run.storm}_${run.date}"
            val files = Jobs.ViewDirs.map(d => store.list(d).count(_.startsWith(prefix))).sum
            stats = stats.copy(
              processed = stats.processed :+ run,
              countriesProcessed = stats.countriesProcessed + 1,
              filesWritten = stats.filesWritten + files)
            completedStorms += run.storm
            completedCountries += country
          } else {
            stats = stats.copy(skipped = stats.skipped :+ (run, result.reason))
          }
        } catch {
          case e: Exception =>
            stats = stats.copy(errors = stats.errors :+
              s"${run.storm}@${run.date}/$country: ${e.getMessage}")
        }
      }
    }

    if (completedStorms.nonEmpty)
      appendCompletionLog(spark, store, completedStorms.toSeq, completedCountries.toSeq,
        stats.filesWritten, (System.nanoTime() - t0) / 1e9)
    stats
  }

  val CompletionLogRel = "control/pipeline_complete_log"

  val completionLogSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("storm_ids", ArrayType(StringType)),
      StructField("countries_processed", ArrayType(StringType)),
      StructField("files_written", IntegerType),
      StructField("status", StringType),
      StructField("runtime_seconds", DoubleType),
      StructField("logged_at", StringType)))
  }

  /**
   * Batch completion signal (signal_pipeline_complete,
   * main_pipeline.py:528-550): one appended row per successful batch — the
   * downstream materialized-view refresh trigger in the reference.
   * Append-only through the control backend (parquet or JDBC warehouse —
   * see [[graft.io.ControlBackend]]); readers take the latest row by
   * `logged_at`.
   */
  def appendCompletionLog(spark: SparkSession, store: DataStore,
                          stormIds: Seq[String], countries: Seq[String],
                          filesWritten: Int, runtimeSeconds: Double): Unit = {
    import spark.implicits._
    val row = Seq((stormIds, countries, filesWritten, "SUCCESS", runtimeSeconds,
      java.time.Instant.now().toString))
      .toDF("storm_ids", "countries_processed", "files_written", "status",
        "runtime_seconds", "logged_at")
    store.controlTables.append(row, CompletionLogRel)
  }

  def readCompletionLog(spark: SparkSession, store: DataStore): DataFrame =
    store.controlTables.read(spark, CompletionLogRel, completionLogSchema)
}
