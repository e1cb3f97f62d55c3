package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {

  import spark.implicits._

  private val benchmark = Seq(
    (100L, "the quick brown fox")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "the quick brown fox runs"),              // shares 2 of its 3 3-grams
    (2L, "nothing in common here at all"),         // clean
    (3L, "xy zz")                                  // too short for any 3-gram
  ).toDF("doc_id", "text")

  test("wordNgrams: distinct n-grams; short docs yield empty arrays") {
    val grams = benchmark.select(Decontamination.wordNgrams(col("text"), 3).as("g"))
      .as[Seq[String]].head()
    assert(grams.toSet == Set("the quick brown", "quick brown fox"))
    val short = corpus.filter($"doc_id" === 3)
      .select(Decontamination.wordNgrams(col("text"), 3).as("g"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("contaminationStats counts benchmark overlaps per corpus doc") {
    val stats = Decontamination.contaminationStats(corpus, benchmark, n = 3,
        hashGrams = false)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(stats == Seq(
      (1L, 3L, 2L, true),
      (2L, 4L, 0L, false),
      (3L, 0L, 0L, false)))
  }

  test("hashed grams produce the same stats as raw strings (no collisions here)") {
    val raw = Decontamination.contaminationStats(corpus, benchmark, n = 3,
      hashGrams = false).orderBy("doc_id").collect().toSeq
    val hashed = Decontamination.contaminationStats(corpus, benchmark, n = 3,
      hashGrams = true).orderBy("doc_id").collect().toSeq
    assert(raw == hashed)
  }

  test("decontaminate drops only docs past the overlap threshold") {
    val strict = Decontamination.decontaminate(corpus, benchmark, n = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(strict.toSeq == Seq(2L, 3L))
    val lenient = Decontamination.decontaminate(corpus, benchmark, n = 3,
        maxOverlap = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(lenient.toSeq == Seq(1L, 2L, 3L))
  }
}
