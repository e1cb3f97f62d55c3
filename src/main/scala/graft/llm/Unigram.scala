package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword segmentation (Kudo, ACL'18 — the SentencePiece
 * unigram model's INFERENCE half): segment each word into the
 * minimum-total-cost piece sequence under a fixed vocabulary of
 * (piece, cost) entries, by Viterbi dynamic programming over character
 * positions. Costs are integer scaled negative log-probs (the shipped-
 * checkpoint convention), so the optimum and its cost are exact and
 * engine-portable — an external oracle can replay the DP by exhaustive
 * path enumeration (a recursive CTE) and take the per-word minimum.
 *
 * Completes the tokenizer family: BPE learns merges (d28) and applies
 * them (d35), WordPiece applies greedy longest-match (d62) — Unigram
 * applies GLOBAL-OPTIMUM segmentation, which differs from greedy
 * exactly when a shorter first piece unlocks a cheaper remainder
 * (planted in the d77 vocab: "table" → [ta ble] beats the whole-word
 * piece, while "customer" keeps it).
 *
 * Scale shape: one narrow per-word DP (O(len · maxPieceLen) table
 * lookups against a broadcast vocab map) — embarrassingly parallel,
 * no shuffle; the vocab is checkpoint-sized (the budget a shipped
 * SentencePiece model occupies). Segment the DISTINCT word table and
 * join back by word when the corpus repeats words heavily.
 */
object Unigram {

  /**
   * Adds (`seg`, `cost`, `n_pieces`) for `wordCol` of each row.
   * Ties (two equal-cost segmentations) resolve to the candidate whose
   * FIRST differing piece starts earlier in the word (ascending split
   * position, strict-improvement DP) — deterministic, but a portable
   * oracle should ship a vocab with unique optima (the d77 vocab is
   * verified unique over its corpus). Words the vocab cannot cover
   * yield null seg/cost — filter or loud-fail at the caller; a real
   * checkpoint always carries single-character/byte fallback pieces.
   */
  def segmentWords(words: DataFrame, wordCol: String,
                   vocab: Map[String, Long]): DataFrame = {
    require(vocab.nonEmpty, "unigram vocab must be non-empty")
    require(vocab.keys.forall(_.nonEmpty), "empty piece in unigram vocab")
    val spark = words.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val maxPiece = vocab.keys.map(_.length).max
    val segUdf = udf { (w: String) =>
      if (w == null || w.isEmpty) None
      else {
        val v = bc.value
        val n = w.length
        val INF = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(INF)
        val back = Array.fill(n + 1)(-1)
        dp(0) = 0L
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPiece)
          while (j < i) {
            if (dp(j) < INF) v.get(w.substring(j, i)) match {
              case Some(c) if dp(j) + c < dp(i) =>
                dp(i) = dp(j) + c; back(i) = j
              case _ => ()
            }
            j += 1
          }
          i += 1
        }
        if (dp(n) >= INF) None
        else {
          val pieces = List.newBuilder[String]
          val stack = scala.collection.mutable.Stack.empty[String]
          var p = n
          while (p > 0) { val j = back(p); stack.push(w.substring(j, p)); p = j }
          while (stack.nonEmpty) pieces += stack.pop()
          val ps = pieces.result()
          Some((ps.mkString(" "), dp(n), ps.length.toLong))
        }
      }
    }
    words
      .withColumn("__seg", segUdf(col(wordCol)))
      .withColumn("seg", col("__seg._1"))
      .withColumn("cost", col("__seg._2"))
      .withColumn("n_pieces", col("__seg._3"))
      .drop("__seg")
  }
}
