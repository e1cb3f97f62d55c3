package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("file-source stream with AvailableNow converges to the batch answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-08-01 00:10:00"), "click", 1.0),
      (2L, java.sql.Timestamp.valueOf("2026-08-01 05:00:00"), "click", 2.0),
      (3L, java.sql.Timestamp.valueOf("2026-08-02 00:30:00"), "view", 5.0)
    ).toDF("event_id", "ts", "event_type", "value")
    events.write.parquet(s"$dir/drop1")

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val stream = Streaming.availableNowFileStream(spark, s"$dir/drop1", schema)
    val out = Streaming.runAvailableNow(
      Streaming.windowedEventCounts(stream), s"t_${System.nanoTime()}")
      .select("window_start", "event_type", "n", "total")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(out == Set(
      (java.sql.Timestamp.valueOf("2026-08-01 00:00:00"), "click", 2L, 3.0),
      (java.sql.Timestamp.valueOf("2026-08-02 00:00:00"), "view", 1L, 5.0)))
  }
}
