package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Map(
    "a" -> 101L, "b" -> 102L, "t" -> 120L, "l" -> 112L, "e" -> 105L,
    "ta" -> 150L, "ble" -> 160L, "table" -> 340L)

  private def seg(words: String*): Map[String, (String, Long, Long)] =
    Unigram.segmentWords(words.toDF("word"), "word", vocab)
      .select("word", "seg", "cost", "n_pieces")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("viterbi beats greedy longest-match where a split unlocks a cheaper tail") {
    // greedy longest-first takes the whole-word piece (340); the global
    // optimum is [ta ble] = 150 + 160 = 310
    assert(seg("table")("table") == (("ta ble", 310L, 2L)))
  }

  test("single chars fall back when no multi-char piece applies") {
    assert(seg("bat")("bat") == (("b a t", 323L, 3L)))
  }

  test("uncovered word yields null seg/cost") {
    val r = Unigram.segmentWords(Seq("zzz").toDF("word"), "word", vocab)
      .select("seg", "cost").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("empty vocab and empty pieces are rejected") {
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("a").toDF("word"), "word", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Unigram.segmentWords(Seq("a").toDF("word"), "word", Map("" -> 1L))
    }
  }
}
