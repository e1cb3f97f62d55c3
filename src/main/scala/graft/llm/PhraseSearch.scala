package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Phrase search over a positional inverted index (Manning, Raghavan &
 * Schütze, IIR §2.4.2 — positional intersection): postings (doc, pos,
 * word) join a broadcast (phrase, word, offset) dictionary, every hit
 * votes for start = pos − offset, and a start whose vote count equals
 * the phrase length is a match. Re-expressed relationally: one narrow
 * posexplode, one broadcast equi-join, one (phrase, doc, start) count.
 *
 * Scale shape: the postings shuffle keys on (phrase, doc, start) whose
 * cardinality is output-plus-near-miss bound (only tokens occurring in
 * some phrase survive the dictionary join); the dictionary is
 * query-sized and always broadcast. At 100 TB the same votes stream
 * into an update-mode state store (s33) — batch and stream share this
 * implementation.
 */
object PhraseSearch {

  /** Phrase words through the SAME normalization TextAnalysis.tokens
    * applies to postings (lowercase, split on any whitespace run) — an
    * unnormalized dictionary would silently match nothing. The reported
    * `phrase` key stays the caller's original string. */
  def phraseWords(p: String): Array[String] =
    p.trim.toLowerCase.split("\\s+")

  /** One row per posting hit: (phrase, doc, start), start 1-based. */
  def votes(docs: DataFrame, idCol: String, textCol: String,
            phrases: Seq[String], s: SparkSession): DataFrame = {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    require(phrases.forall(phraseWords(_).length >= 2),
      "phrases must have >= 2 words (single terms are a plain postings probe)")
    import s.implicits._
    val ph = phrases.flatMap { p =>
      phraseWords(p).zipWithIndex.map { case (w, i) => (p, w, i) }
    }.toDF("phrase", "w", "i")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("p", "w")))
      .join(broadcast(ph), "w")
      .select(col("phrase"), col("doc_id"),
        (col("p") + 1 - col("i")).cast("long").as("start"))
  }

  /** Rollup of full-vote starts to (phrase, doc, n_occ, first_pos). */
  def matches(fullVotes: DataFrame): DataFrame =
    fullVotes
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("n_occ"), min(col("start")).as("first_pos"))
      .orderBy("phrase", "doc_id")

  /** Batch phrase search end-to-end: votes → full-vote filter → matches. */
  def search(docs: DataFrame, idCol: String, textCol: String,
             phrases: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val lens = phrases.map(p => (p, phraseWords(p).length.toLong))
      .toDF("phrase", "__len")
    val full = votes(docs, idCol, textCol, phrases, s)
      .groupBy("phrase", "doc_id", "start").agg(count(lit(1)).as("__k"))
      .join(broadcast(lens), "phrase")
      .filter(col("__k") === col("__len"))
    matches(full)
  }
}
