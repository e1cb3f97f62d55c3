package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhraseSearchSpec extends SparkSpec {

  import spark.implicits._

  private def search(docs: Seq[(Long, String)], phrases: String*) =
    PhraseSearch.search(docs.toDF("doc_id", "text"), "doc_id", "text", phrases)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("overlapping occurrences all count; first_pos is 1-based") {
    // "a b a b a" contains "a b a" at starts 1 AND 3 (overlapping)
    val got = search(Seq((1L, "a b a b a")), "a b a")
    assert(got(("a b a", 1L)) == ((2L, 1L)), s"got $got")
  }

  test("phrase at document start and end; non-matching docs absent") {
    val got = search(Seq(
      (1L, "x y z tail"), (2L, "head x y z"), (3L, "x z y")), "x y z")
    assert(got == Map(("x y z", 1L) -> ((1L, 1L)), ("x y z", 2L) -> ((1L, 2L))),
      s"got $got")
  }

  test("repeated-word phrase cannot false-positive on partial matches") {
    // "a b c": start 1 matches a/b but NOT the trailing a of "a b a" —
    // the (offset, position) votes are distinct rows, so 2 votes != 3
    val got = search(Seq((1L, "a b c"), (2L, "a b a")), "a b a")
    assert(got == Map(("a b a", 2L) -> ((1L, 1L))), s"got $got")
  }

  test("multiple phrases stay separated; tokenization lowercases") {
    val got = search(Seq((1L, "Alpha BETA gamma delta")),
      "alpha beta gamma", "beta gamma delta")
    assert(got == Map(
      ("alpha beta gamma", 1L) -> ((1L, 1L)),
      ("beta gamma delta", 1L) -> ((1L, 2L))), s"got $got")
  }

  test("single-word phrases are rejected") {
    intercept[IllegalArgumentException] {
      PhraseSearch.search(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("solo"))
    }
  }
}
