package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE (byte-pair-encoding) merge learning — the vocabulary-
 * induction core of modern tokenizers, shaped for Spark:
 *
 *  - the corpus collapses ONCE into a word-frequency table (vocabulary-
 *    sized — orders of magnitude smaller than the corpus — and cached),
 *  - each merge round is ONE map-side-combinable aggregate over that table
 *    (adjacent symbol-pair counts weighted by word frequency),
 *  - the only driver-side datum per round is the argmax row — the learned
 *    rule itself, inherently driver-state like k-means centroids,
 *  - the rule applies as a narrow per-row greedy fold; no shuffle grows
 *    with the corpus, nothing is quadratic.
 *
 * Determinism: count ties break on the pair string, so the learned merge
 * sequence is engine-independent — the d28 oracle replays the identical
 * rounds in DuckDB as unrolled CTEs and must reproduce the table exactly.
 */
object Bpe {

  /** The word as a space-separated character symbol string. */
  private def charSym(w: Column): Column =
    concat_ws(" ",
      transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))

  /**
   * One greedy left-to-right application of merge (lft, rgt) to a
   * space-separated symbol string: fold the symbols into a string
   * accumulator, gluing `rgt` directly onto an accumulator that currently
   * ends with the COMPLETE token `lft`. A string `replace(" lft rgt ",
   * " lftrgt ")` is NOT equivalent — back-to-back occurrences share the
   * separator space the first replacement consumes ("a b a b" would merge
   * only once) — so the fold is the correct primitive in both engines.
   */
  def applyMerge(sym: Column, lft: String, rgt: String): Column = {
    val parts = split(sym, " ")
    aggregate(slice(parts, lit(2), size(parts) - 1), element_at(parts, 1),
      (acc, x) =>
        when((acc === lit(lft) || acc.endsWith(lit(" " + lft))) && x === lit(rgt),
          concat(acc, lit(rgt)))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** Adjacent symbol pairs ("lft rgt") of a space-separated symbol string. */
  def adjacentPairs(sym: Column): Column = {
    val parts = split(sym, " ")
    zip_with(slice(parts, lit(1), size(parts) - 1), slice(parts, lit(2), size(parts) - 1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Word-frequency table: one row per distinct word, `sym` = the word as
    * space-separated characters, `freq` = corpus occurrences. This is the
    * ONLY pass over the corpus; every training round runs on this table. */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(charSym(col("w")).as("sym"), col("freq"))

  /**
   * Learn `numMerges` merge rules from the corpus. Returns the merge table
   * (merge_rank, lft, rgt, pair_freq) — ranks are 1-based in learned
   * order. Stops early if the corpus runs out of adjacent pairs.
   */
  def learnMerges(docs: DataFrame, textCol: String = "text",
                  numMerges: Int = 8): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    var words = wordTable(docs, textCol).cache()
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var done = false
    for (rank <- 1 to numMerges if !done) {
      // one aggregate; the collect is the single learned rule (bounded)
      val best = words
        .select(explode(adjacentPairs(col("sym"))).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        val n = best(0).getLong(1)
        val Array(lft, rgt) = pair.split(" ", 2)
        learned += ((rank, lft, rgt, n))
        val next = words
          .select(applyMerge(col("sym"), lft, rgt).as("sym"), col("freq"))
          .cache()
        next.count() // materialize before dropping the parent from cache
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    spark.createDataFrame(learned.toSeq).toDF("merge_rank", "lft", "rgt", "pair_freq")
  }

  /** [[applyMerge]] with the rule arriving as a runtime struct value
    * (lambda-captured) instead of string literals. */
  private def applyMergeDyn(sym: Column, rule: Column): Column = {
    val lft = rule.getField("l")
    val rgt = rule.getField("r")
    val parts = split(sym, " ")
    aggregate(slice(parts, lit(2), size(parts) - 1), element_at(parts, 1),
      (acc, x) =>
        when((acc === lft || acc.endsWith(concat(lit(" "), lft))) && x === rgt,
          concat(acc, rgt))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** Tokenize `textCol` with a learned merge table: each word's characters
    * re-folded through the rules in rank order. The merge list is tiny and
    * arrives as an array literal — a narrow projection, no join, no
    * shuffle.
    *
    * The rule chain is a RUNTIME fold (`aggregate` over the merges array),
    * not a compile-time one: folding Columns with `merges.foldLeft` would
    * nest each round's symbol expression inside the next, and since
    * [[applyMergeDyn]] references its input 3× (slice/size/element_at of
    * the split), Catalyst would re-evaluate the whole upstream chain 3×
    * per level — 3^k blowup per word (20+ minutes at sf0.1 with k = 6).
    * As an array fold the accumulator is a materialized VALUE between
    * rounds, so the cost is the honest O(k·len) per word. */
  def applyMerges(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text", outCol: String = "bpe_tokens"): DataFrame = {
    val ruleArr = array(merges.map { case (l, r) =>
      struct(lit(l).as("l"), lit(r).as("r"))
    }: _*)
    docs.withColumn(outCol,
      flatten(transform(TextAnalysis.tokens(col(textCol)), w =>
        split(aggregate(ruleArr, charSym(w), (sym, rule) => applyMergeDyn(sym, rule)), " "))))
  }
}
