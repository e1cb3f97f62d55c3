package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/**
 * State-SIZE contracts, read straight from the checkpoint via Spark's
 * `statestore` data source: the converged store must hold EXACTLY one
 * row per distinct key for every stateful-aggregation class the board
 * ships — complete-mode counts (s11/s17), update-mode aggregations
 * (s22/s24/s36), and dropDuplicates dedup state. These bounds are the
 * documented scale story ("state is O(distinct keys), emission differs")
 * — this spec pins them as numbers instead of prose, so a regression
 * that starts keeping per-ROW state (or leaking versions) fails loudly.
 */
class StateBoundsSpec extends SparkSpec {

  import spark.implicits._

  /** Three small drops so the stream converges over MULTIPLE microbatches
    * (per-batch state overwrite, not a single-batch triviality). */
  private def corpusDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-statebounds").toString
    Seq((1L, "a b a c"), (2L, "b c d")).toDF("doc_id", "text")
      .write.parquet(s"$dir/docs")
    Seq((3L, "a b e"), (4L, "e e f")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/docs")
    Seq((5L, "a b a c")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/docs")
    s"$dir/docs"
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def runWithCheckpoint(streamed: DataFrame, mode: String): String = {
    val ckpt = java.nio.file.Files.createTempDirectory("sbck").toString
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(s"sb_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ckpt
  }

  private def stateRows(ckpt: String): Long =
    spark.read.format("statestore").option("path", ckpt).load().count()

  test("complete-mode aggregation state == one row per distinct key (s11/s17 contract)") {
    val dir = corpusDir()
    val stream = Streaming.availableNowFileStream(spark, dir, schema)
    val counts = stream
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n"))
    val ckpt = runWithCheckpoint(counts, "complete")
    val distinctKeys = spark.read.parquet(dir)
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("item"))
      .select("item").distinct().count()
    assert(distinctKeys == 6, s"corpus drifted: $distinctKeys") // a..f
    assert(stateRows(ckpt) == distinctKeys,
      s"complete-mode state must hold exactly $distinctKeys rows")
  }

  test("update-mode aggregation state == one row per distinct key (s22/s36 contract)") {
    val dir = corpusDir()
    val stream = Streaming.availableNowFileStream(spark, dir, schema)
    // the s22 bigram shape: pairs of adjacent tokens
    val counts = stream
      .select(graft.llm.TextAnalysis.tokens(col("text")).as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__ts")) - 1), i =>
        struct(element_at(col("__ts"), i).as("w1"),
          element_at(col("__ts"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val ckpt = runWithCheckpoint(counts, "update")
    val distinctPairs = spark.read.parquet(dir)
      .select(graft.llm.TextAnalysis.tokens(col("text")).as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__ts")) - 1), i =>
        struct(element_at(col("__ts"), i).as("w1"),
          element_at(col("__ts"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1"), col("b.w2")).distinct().count()
    assert(stateRows(ckpt) == distinctPairs,
      s"update-mode state must hold exactly $distinctPairs rows (one per pair)")
    // update mode changes EMISSION, not state: the store is identical in
    // size to the complete-mode store for the same aggregation
  }

  test("watermarked session windows: finalized sessions EVICT — state holds open sessions only") {
    // two sessions per key 30 days apart; the second batch's watermark
    // (max ts − 1 day) passes the first session's end, so it finalizes
    // and leaves the store — the bound that keeps session state O(open
    // sessions), not O(history)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    def ev(id: Long, ts: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), "click", v)
    Seq(ev(1, "2026-07-01 00:00:00", 1.0), ev(2, "2026-07-01 00:30:00", 2.0))
      .toDF("event_id", "ts", "event_type", "value").write.parquet(s"$dir/b0")
    Seq(ev(3, "2026-08-01 00:00:00", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(s"$dir/b0")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b0")
    val sessions = Streaming.sessionWindowedCounts(
      stream, Seq("event_type"), gap = "2 hours", watermark = "1 day")
    val ckpt = runWithCheckpoint(sessions, "append")
    assert(stateRows(ckpt) == 1,
      "only the August session may remain in the store — the July session " +
        "must have finalized and evicted when the watermark passed it")
  }

  test("dropDuplicates state == one row per distinct key (s24 url-dedup contract)") {
    val dir = corpusDir()
    val stream = Streaming.availableNowFileStream(spark, dir, schema)
    val deduped = Streaming.dedupedStream(
      stream.select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("k")),
      Seq("k"))
    val ckpt = runWithCheckpoint(deduped, "append")
    assert(stateRows(ckpt) == 6,
      "dedup state must hold exactly one row per distinct key seen")
  }
}
