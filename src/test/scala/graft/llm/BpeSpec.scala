package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("applyMerge: greedy left-to-right, back-to-back occurrences both merge") {
    val df = Seq("a b a b", "a a a", "x a b y", "a", "a b b").toDF("sym")
    val out = df.select(col("sym"), Bpe.applyMerge(col("sym"), "a", "b").as("m"))
      .as[(String, String)].collect().toMap
    assert(out("a b a b") == "ab ab", "string replace would miss the second pair")
    assert(out("a a a") == "a a a")
    assert(out("x a b y") == "x ab y")
    assert(out("a") == "a")
    assert(out("a b b") == "ab b")
  }

  test("applyMerge: rule (a,a) merges greedily without chaining") {
    val out = Seq("a a a").toDF("sym")
      .select(Bpe.applyMerge(col("sym"), "a", "a")).as[String].head()
    assert(out == "aa a")
  }

  test("learnMerges: hand-computed sequence on a fixed corpus") {
    // corpus: "low low low lower lowest" — classic BPE example shape.
    // word freqs: low×3, lower×1, lowest×1
    // round 1 pairs: (l,o)×5 (o,w)×5 (w,e)×2 (e,r)×1 (e,s)×1 (s,t)×1
    //   → tie (l o)=(o w)=5, pair-string tie-break picks "l o" → "lo"
    // round 2: (lo,w)×5 wins → "low"
    // round 3: (low,e)×2 wins → "lowe"
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 3)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)),
      s"got $merges")
  }

  test("learnMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // single-char words only
    val merges = Bpe.learnMerges(docs, numMerges = 5).collect()
    assert(merges.isEmpty)
  }

  test("applyMerges tokenizes with the learned rules in rank order") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val rules = Seq(("l", "o"), ("lo", "w"), ("low", "e"))
    val toks = Bpe.applyMerges(docs, rules).select("bpe_tokens")
      .as[Seq[String]].head()
    assert(toks == Seq("low", "low", "low", "lowe", "r", "lowe", "s", "t"), s"got $toks")
  }
}
