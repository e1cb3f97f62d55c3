package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling for training-data pipelines: media travel as
 * opaque `binary` columns with a typed metadata struct; decode/resize/
 * frame-sample are per-row transforms batched via `mapPartitions` (the
 * Scala analogue of Python's mapInPandas batches).
 *
 * The decode step is a clearly-marked STUB — media codec libraries are not
 * available in this build environment — but the Spark-side plumbing is
 * real and tested: schema, batch shape, partition-level processing,
 * deterministic fake features. Swapping [[decodeStub]] for a real codec
 * (javacv / ImageIO) changes no plan shape.
 */
object Multimodal {

  /** media metadata struct carried alongside the payload. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4 …
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", MetadataSchema)))

  /** Deterministic fake "decode" — stands in for a real image/audio codec.
    * Returns a fixed-length feature vector derived from the payload bytes so
    * downstream operators (ANN, dedup) are exercised with stable values. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload != null) {
      var h = graft.util.Hashing.FnvOffset
      var i = 0
      while (i < payload.length) {
        h = (h ^ payload(i)) * graft.util.Hashing.FnvPrime
        out(i % dim) += ((h >>> 40).toInt % 256) / 256.0f
        i += 1
      }
    }
    out
  }

  /**
   * Feature extraction over media rows, batched per partition (one codec
   * context per partition, like one model per Python worker): adds
   * `features: array<float>`. Narrow map — no shuffle, scales with input.
   */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition "codec" init happens here (stubbed)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ decodeStub(payload, dim).toSeq)
      }
    }(enc)
  }

  /** Image resize stub: rewrites the metadata dims, payload untouched
    * (??? real pixel work requires a codec). Plan shape is the real one. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = udf { (w: java.lang.Integer, h: java.lang.Integer) =>
      if (w == null || h == null) null
      else {
        val m = math.max(w.toInt, h.toInt)
        if (m <= maxDim) (w.toInt, h.toInt)
        else (math.round(w.toInt * maxDim.toDouble / m).toInt,
              math.round(h.toInt * maxDim.toDouble / m).toInt)
      }
    }.apply(col("meta.width"), col("meta.height"))
    media.withColumn("__dims", scale)
      .withColumn("meta", struct(
        col("meta.media_type"), col("meta.format"),
        col("__dims._1").as("width"), col("__dims._2").as("height"),
        col("meta.duration_ms")))
      .drop("__dims")
  }

  /** Frame sampling for video rows: explode into one row per sampled frame
    * timestamp (every `everyMs` within duration). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("meta.media_type") === "video" && col("meta.duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))

  /** Synthesize a deterministic media table from any keyed table — test/
    * bench input when no real media exists. */
  def syntheticMedia(keys: DataFrame, idCol: String): DataFrame = {
    val payload = udf { (id: Long) =>
      val bytes = new Array[Byte](64 + (id % 64).toInt)
      var i = 0
      while (i < bytes.length) {
        bytes(i) = (graft.util.Hashing.mix64(id * 1000L + i) & 0xFF).toByte
        i += 1
      }
      bytes
    }
    keys.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", payload(col("media_id")))
      .withColumn("meta", struct(
        when(col("media_id") % 3 === 0, "image")
          .when(col("media_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        lit("stub").as("format"),
        (col("media_id") % 1000 + 100).cast("int").as("width"),
        (col("media_id") % 800 + 100).cast("int").as("height"),
        when(col("media_id") % 3 === 2, (col("media_id") % 10000 + 1000).cast("long"))
          .otherwise(lit(null).cast("long")).as("duration_ms")))
  }
}
