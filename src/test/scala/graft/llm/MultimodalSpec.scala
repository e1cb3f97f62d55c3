package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("k"), "k")

  test("synthetic media: typed metadata struct, deterministic payloads") {
    val rows = media.collect()
    assert(rows.length == 6)
    val types = media.select("meta.media_type").as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
    // videos carry a duration; images/audio don't
    assert(media.filter($"meta.media_type" === "video" && $"meta.duration_ms".isNull).count() == 0)
    assert(media.filter($"meta.media_type" =!= "video" && $"meta.duration_ms".isNotNull).count() == 0)
  }

  test("extractFeatures: fixed-dim vectors, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1.values.forall(_.length == 8))
    assert(f1 == f2)
    assert(f1(0L) != f1(1L)) // payloads differ -> features differ
  }

  test("resizeImages caps the max dimension, preserving aspect") {
    val resized = Multimodal.resizeImages(media, maxDim = 50)
    val dims = resized.select($"media_id", $"meta.width", $"meta.height")
      .as[(Long, Int, Int)].collect()
    dims.foreach { case (_, w, h) => assert(math.max(w, h) <= 50) }
  }

  test("sampleFrames: one row per sampled timestamp within duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
        first("meta.duration_ms").as("dur"))
      .as[(Long, Long, Long)].collect()
    assert(perVideo.nonEmpty)
    perVideo.foreach { case (_, n, dur) => assert(n == (dur - 1) / 1000 + 1) }
  }
}
