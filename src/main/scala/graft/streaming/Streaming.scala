package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming surface (SURVEY.md §2.8). The reference has no
 * streaming runtime — it emulates incremental processing with 6-hourly batch
 * re-runs plus a processed-state anti-join (main_pipeline.py:466-481,
 * 650-666). The Spark-native equivalents:
 *
 *  - [[availableNowFileStream]]: a file-source stream over a drop directory
 *    processed with Trigger.AvailableNow — the idiomatic "cron batch with
 *    exactly-once bookkeeping": the checkpoint replaces storms.json, late
 *    re-drops are deduplicated by the source's file tracking.
 *  - [[windowedEventCounts]]: watermarked sliding-window aggregation over an
 *    event stream (the engine's generic streaming agg primitive).
 *  - [[runAvailableNow]]: drives a streaming DataFrame to a memory sink
 *    synchronously and returns the result as a batch DataFrame — used by the
 *    oracle-checked streaming queries (the stream must converge to the batch
 *    answer; that equivalence IS the correctness check).
 */
object Streaming {

  /** File-source stream over a directory of parquet drops. `glob` narrows
    * the files when pointing at a shared directory (the file source requires
    * a directory basePath). */
  def availableNowFileStream(spark: SparkSession, dir: String, schema: StructType,
                             glob: Option[String] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.parquet(dir)
  }

  /**
   * Watermarked tumbling-window aggregation: counts + sums per
   * (window, event_type). Watermark bounds state: at 100 TB-rates the state
   * store only retains windows newer than the watermark horizon.
   */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 day",
                          watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Run a streaming DataFrame to completion (AvailableNow) into a memory
    * sink; returns the materialized result. Complete output mode. */
  def runAvailableNow(streamed: DataFrame, queryName: String): DataFrame = {
    val spark = streamed.sparkSession
    val q = streamed.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
