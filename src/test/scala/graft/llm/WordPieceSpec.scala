package graft.llm

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Set("un", "break", "##able", "##break", "b", "##reak")

  test("segment: greedy longest-match with continuations, no backtracking") {
    // longest FIRST piece wins even when a shorter one also segments
    assert(WordPiece.segment("breakable", vocab).contains(Seq("break", "##able")))
    assert(WordPiece.segment("unbreakable", vocab)
      .contains(Seq("un", "##break", "##able")))
    // a full-coverage single piece
    assert(WordPiece.segment("break", vocab).contains(Seq("break")))
    // dead end mid-word: 'break' consumes greedily, 'x' has no piece
    assert(WordPiece.segment("breakx", vocab).isEmpty)
    // no first piece at all
    assert(WordPiece.segment("zzz", vocab).isEmpty)
    // a word literally starting with "##" must not alias a continuation
    // piece into first position — [UNK], not Seq("##able")
    assert(WordPiece.segment("##able", vocab).isEmpty)
    // greedy traps itself: 'break' eats the prefix of 'breakreak' leaving
    // 'reak' (only '##reak' exists — matches) — but for 'breakb' the tail
    // 'b' has no continuation form, so greedy dead-ends with NO backtrack
    assert(WordPiece.segment("breakreak", vocab).contains(Seq("break", "##reak")))
    assert(WordPiece.segment("breakb", vocab).isEmpty)
  }

  test("pieceCounts: frequencies re-weight per-word segmentations; [UNK] aggregates") {
    val docs = Seq(
      (1L, "break break unbreakable"),
      (2L, "zzz break  breakx"), // double space: split on \s+ drops empties
      (3L, "ZZZ Break")          // lowercase contract
    ).toDF("doc_id", "text")
    val got = WordPiece.pieceCounts(docs, "text", vocab.toSeq)
      .as[(String, Long)].collect().toMap
    assert(got("break") == 4L)
    assert(got("un") == 1L && got("##break") == 1L && got("##able") == 1L)
    assert(got("[UNK]") == 3L, s"zzz×2 + breakx: $got")
    assert(!got.contains("b"), "unused vocab pieces must not appear")
  }
}
