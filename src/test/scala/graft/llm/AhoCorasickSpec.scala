package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class AhoCorasickSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("firstMatch: priority is LIST order, not text position") {
    val ac = new AhoCorasick(Seq("late", "early"))
    // "early" appears first in the text, but "late" wins on list order
    assert(ac.firstMatch(u("early and late")) == 0)
    assert(ac.firstMatch(u("only early")) == 1)
    assert(ac.firstMatch(u("neither")) == -1)
  }

  test("suffix-link matches: a pattern ending inside another's walk fires") {
    // "he" must fire while the automaton walks "she" — the classic AC case
    val ac = new AhoCorasick(Seq("he", "she", "hers"))
    assert(ac.firstMatch(u("she said")) == 0)   // "she" contains "he"
    assert(ac.matchedCount(u("she said")) == 2) // she + he
    assert(ac.matchedCount(u("ushers"))  == 3)  // she, he, hers
  }

  test("overlapping occurrences of one pattern count once") {
    val ac = new AhoCorasick(Seq("aa"))
    assert(ac.matchedCount(u("aaaa")) == 1)
    assert(ac.firstMatch(u("aaaa")) == 0)
  }

  test("duplicate pattern keeps the smallest index") {
    val ac = new AhoCorasick(Seq("x", "dup", "dup"))
    assert(ac.firstMatch(u("a dup")) == 1)
  }

  test("multi-byte UTF-8 patterns match on bytes") {
    val ac = new AhoCorasick(Seq("café", "tea"))
    assert(ac.firstMatch(u("iced café")) == 0)
    assert(ac.firstMatch(u("green tea")) == 1)
    // "caf" alone must not fire the café pattern
    assert(ac.firstMatch(u("caf only")) == -1)
  }

  test("agrees with contains() on random word-salad text") {
    val pats = Seq("table table", "slow fast", "fast slow", "never here")
    val ac = new AhoCorasick(pats)
    val words = Array("table", "slow", "fast", "a", "the")
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val text = (1 to 12).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      val expFirst = pats.indexWhere(text.contains)
      assert(ac.firstMatch(u(text)) == expFirst, s"firstMatch on '$text'")
      assert(ac.matchedCount(u(text)) == pats.count(text.contains),
        s"matchedCount on '$text'")
    }
  }

  test("expressions: aho_first/aho_count match the CASE/contains plan") {
    val s = spark
    import s.implicits._
    val pats = Seq("ab", "bc", "zz")
    val df = Seq("xaby", "abc", "bcd", "none", "zzz ab").toDF("text")
    val got = df.select(
        TextAnalysis.blocklistFirstHit(col("text"), pats).as("first"),
        TextAnalysis.blocklistHitCount(col("text"), pats).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((0, 1), (0, 2), (1, 1), (-1, 0), (0, 2)))
  }

  test("expression null-propagates on null text") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("ab"), None).toDF("text")
    val got = df.select(
      TextAnalysis.blocklistFirstHit(col("text"), Seq("ab")).as("f")).collect()
    assert(got(0).getInt(0) == 0)
    assert(got(1).isNullAt(0))
  }
}
