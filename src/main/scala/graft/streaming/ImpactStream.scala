package graft.streaming

import graft.io.DataStore
import graft.pipeline.Jobs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * The reference's 6-hourly cron loop (SURVEY.md §2.8 "Trigger";
 * main_pipeline.py:556-767 + snowflake/README.md schedule) as a Structured
 * Streaming driver: a file-source stream watches an envelope drop directory;
 * each microbatch extracts its distinct (storm, forecast) keys and runs the
 * full [[Jobs.update]] view pipeline for each.
 *
 * Exactly-once layering mirrors the reference's belt-and-suspenders:
 *  - the streaming CHECKPOINT tracks which drop files were consumed (a
 *    re-started stream never reprocesses a file);
 *  - [[Jobs.update]]'s processed-state key check (storms.json analogue,
 *    J13) suppresses a re-DROPPED copy of an already-processed forecast.
 *
 * The per-batch work is fully distributed — foreachBatch runs the same
 * declarative view pipeline the batch driver runs; only the tiny key
 * extraction collects.
 */
object ImpactStream {

  /** Wire schema of an envelope drop file (S1 + the orchestration keys). */
  val DropSchema: StructType = StructType(Seq(
    StructField("track_id", StringType),
    StructField("forecast_time", StringType), // compact yyyyMMddHHmmss
    StructField("ensemble_member", IntegerType),
    StructField("wind_threshold", IntegerType),
    StructField("geometry", BinaryType)))

  case class BatchResult(storm: String, date: String, processed: Boolean, reason: String)

  /**
   * Start the stream. Results of each per-key update are appended to
   * `onResult` (driver-side callback; used by specs and ops logging).
   * Trigger.AvailableNow turns this into the reference's cron batch;
   * a processing-time trigger turns the same code into a live feed.
   */
  def start(spark: SparkSession, store: DataStore, dropDir: String,
            country: String, zoom: Int,
            trigger: Trigger = Trigger.AvailableNow(),
            onResult: BatchResult => Unit = _ => ()): StreamingQuery = {
    val stream = spark.readStream.schema(DropSchema).parquet(dropDir)
    // one checkpoint per watched directory (String.hashCode is stable
    // across JVMs) — two drop feeds into the same store never collide
    val ckpt = s"impact_stream_ckpt_${java.lang.Integer.toHexString(dropDir.hashCode)}"
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", store.path("control", ckpt))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keys = batch.select("track_id", "forecast_time").distinct()
          .orderBy("track_id", "forecast_time").collect()
        keys.foreach { k =>
          val (storm, date) = (k.getString(0), k.getString(1))
          val envs = batch
            .filter(col("track_id") === storm && col("forecast_time") === date)
            .drop("track_id", "forecast_time")
          val r = Jobs.update(spark, store, country, zoom, storm, date, envs, None)
          onResult(BatchResult(storm, date, r.processed, r.reason))
        }
      }
      .trigger(trigger)
      .start()
  }

  /** Run one AvailableNow pass over the drop directory and return the
    * per-key results (the cron-equivalent entry point). */
  def runOnce(spark: SparkSession, store: DataStore, dropDir: String,
              country: String, zoom: Int): Seq[BatchResult] = {
    val results = new java.util.concurrent.ConcurrentLinkedQueue[BatchResult]()
    val q = start(spark, store, dropDir, country, zoom,
      onResult = results.add(_))
    q.awaitTermination()
    results.toArray(Array.empty[BatchResult]).toSeq
  }
}
