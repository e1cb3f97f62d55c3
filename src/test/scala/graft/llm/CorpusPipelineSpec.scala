package graft.llm

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val enBase = "the cat and the dog went to the market in town and it was " +
    "a fine day for all of them to walk around the square with friends"
  private val esBase = "el mercado de la ciudad es un lugar que la gente visita " +
    "en los dias de fiesta y por la tarde se llena de un monton de gente"

  test("clean drops short, punctuation-heavy, duplicate, near-dup and off-language docs") {
    val docs = Seq(
      1L -> enBase,                                   // keeper (en)
      2L -> enBase,                                   // exact dup of 1 -> dropped
      3L -> (enBase + " extra tail words here now"),  // near-dup of 1 -> dropped
      4L -> esBase,                                   // keeper (es)
      5L -> "too short",                              // quality: length -> dropped
      6L -> ("!?!; ...:) -- !!! ,,, " * 8),           // quality: punct -> dropped
      7L -> ("der hund und die katze sind mit der bahn in den wald gefahren " +
        "und das war auf jeden fall ein guter tag mit den freunden von sich")  // de -> lang-dropped
    ).toDF("doc_id", "text")

    val cleaned = CorpusPipeline.clean(docs,
      cfg = CorpusCleanConfig(minChars = 50, minTokens = 10, maxPunctRatio = 0.25,
        keepLangs = Set("en", "es"), nearDup = true, minEstJaccard = 0.5))

    val survivors = cleaned.select("doc_id", "lang_pred").as[(Long, String)]
      .collect().toMap
    assert(survivors.keySet == Set(1L, 4L), s"survivors: $survivors")
    assert(survivors(1L) == "en")
    assert(survivors(4L) == "es")
  }

  test("nearDup=false keeps the near-duplicate; empty keepLangs keeps all languages") {
    val docs = Seq(
      1L -> enBase,
      3L -> (enBase + " extra tail words here now"),
      7L -> ("der hund und die katze sind mit der bahn in den wald gefahren " +
        "und das war auf jeden fall ein guter tag mit den freunden von sich")
    ).toDF("doc_id", "text")
    val cleaned = CorpusPipeline.clean(docs,
      cfg = CorpusCleanConfig(minChars = 50, minTokens = 10, maxPunctRatio = 0.25,
        keepLangs = Set.empty, nearDup = false))
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 7L))
  }

  test("cleanStream converges to the batch clean result (survivor texts)") {
    val rows = Seq(
      1L -> enBase,
      2L -> enBase,          // stream dedup drops one of the identical pair
      4L -> esBase,
      5L -> "too short")
    val dir = java.nio.file.Files.createTempDirectory("corpus_stream").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/drop")
    val cfg = CorpusCleanConfig(minChars = 50, minTokens = 10, maxPunctRatio = 0.25,
      keepLangs = Set("en", "es"), nearDup = false)

    val stream = graft.streaming.Streaming.availableNowFileStream(
      spark, s"$dir/drop", rows.toDF("doc_id", "text").schema)
    val streamed = graft.streaming.Streaming.runAvailableNow(
      CorpusPipeline.cleanStream(stream, cfg = cfg),
      s"corpus_clean_${System.nanoTime()}", outputMode = "append")
      .select("text").as[String].collect().toSet

    val batch = CorpusPipeline.clean(rows.toDF("doc_id", "text"), cfg = cfg)
      .select("text").as[String].collect().toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed == Set(enBase, esBase))
  }
}
