package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WordPiece tokenization (Schuster & Nakajima, ICASSP'12 — the BERT
 * tokenizer family): greedy longest-match-first against a fixed
 * vocabulary, continuation pieces prefixed `##`, and the whole word
 * mapping to `[UNK]` when any step dead-ends (greedy does NOT
 * backtrack — a longest-match choice that strands the remainder is a
 * dead end by contract). Complements [[Bpe]]: BPE LEARNS merges from
 * the corpus (d28); WordPiece APPLIES a shipped vocabulary — the shape
 * a production pipeline runs when tokenizing a crawl against a
 * published checkpoint's vocab file.
 *
 * Scale shape: segmentation runs once per DISTINCT word, never per
 * token — explode → word-frequency aggregate (one map-side-combinable
 * shuffle over a vocabulary-sized keyspace), greedy-match the distinct
 * words (narrow, broadcast vocab set), then re-weight piece counts by
 * word frequency. At 100 TB of text the string work is
 * O(|distinct words| · L²), independent of corpus size, and no exchange
 * ever carries more than (word/piece, count) rows.
 */
object WordPiece {

  /** Greedy longest-match segmentation of one word. None on a dead end
    * (no vocab piece matches at some position) — the caller maps the
    * whole word to the unknown token, per the WordPiece contract. */
  private[llm] def segment(word: String, vocab: Set[String]): Option[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var end = word.length
      var hit: String = null
      while (hit == null && end > pos) {
        val cand = (if (pos == 0) "" else "##") + word.substring(pos, end)
        // a word that literally starts with "##" must not alias a
        // continuation piece into first position — first pieces and
        // continuations are disjoint namespaces by the vocab convention
        if (vocab.contains(cand) && !(pos == 0 && cand.startsWith("##")))
          hit = cand
        else end -= 1
      }
      if (hit == null) return None
      out += hit
      pos = end
    }
    Some(out.toSeq)
  }

  /**
   * Whitespace-tokenize `textCol` (the d25 `trim ∘ lower ∘ split-\s+`
   * contract), WordPiece-encode every token against `vocab`, and return
   * corpus-wide piece counts `(piece, n)`; `unk` aggregates the
   * dead-ended words.
   */
  def pieceCounts(docs: DataFrame, textCol: String, vocab: Seq[String],
                  unk: String = "[UNK]"): DataFrame = {
    require(vocab.nonEmpty, "empty WordPiece vocab")
    val vocabSet = vocab.toSet
    val segUdf = udf { (word: String) =>
      segment(word, vocabSet).getOrElse(Seq(unk))
    }
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("piece", explode(segUdf(col("word"))))
      .groupBy("piece").agg(sum(col("cnt")).as("n"))
  }
}
