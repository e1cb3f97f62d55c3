package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag/remove training documents that overlap an
 * evaluation set by shared word n-grams — the standard "n-gram collision"
 * decontamination step every serious training-data pipeline runs before
 * training (GPT-3 used 13-grams; the n is a knob here).
 *
 * Scale design (the 100 TB side is the corpus, not the benchmark):
 *  - The benchmark's distinct n-gram set is small (eval sets are thousands
 *    of documents, not billions) → it is the BROADCAST side. The corpus is
 *    never shuffled: explode to (doc_id, gram) is narrow, the semi-join
 *    against the benchmark set broadcasts, and the per-doc match count is
 *    a map-side-combinable groupBy on doc_id — one shuffle of only the
 *    matching (doc_id, gram) pairs, which decontamination assumes are rare.
 *  - `hashGrams = true` (the production default) replaces each n-gram
 *    string with its xxhash64 BEFORE the join, so the broadcast table and
 *    the shuffled pairs are 8-byte longs instead of strings. A hash
 *    collision can only ADD a false positive (drop one clean doc) — the
 *    safe direction for decontamination. `hashGrams = false` keeps raw
 *    strings so a second engine reproduces the result bit-for-bit (the
 *    oracle twin; DecontaminationSpec pins hashed ≡ unhashed on data with
 *    no collisions).
 */
object Decontamination {

  /** Distinct word n-grams of the lowercased whitespace-tokenized text.
    * Documents shorter than n tokens yield an empty array (they cannot
    * collide with any benchmark n-gram). */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // Hoist.once: inlining the token split into the lambda would re-run
    // it n times per gram position (the d64 lesson)
    graft.util.Hoist.once(TextAnalysis.tokens(text)) { toks =>
      array_distinct(
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>")))
    }
  }

  /** The benchmark's distinct n-gram set: one column `gram` (string, or
    * xxhash64 long when `hashGrams`). Cache/persist this when screening
    * many corpus shards against the same eval set. */
  def benchmarkNgrams(benchmark: DataFrame, textCol: String, n: Int,
                      hashGrams: Boolean): DataFrame = {
    val grams = benchmark.select(explode(wordNgrams(col(textCol), n)).as("gram"))
    (if (hashGrams) grams.select(xxhash64(col("gram")).as("gram")) else grams).distinct()
  }

  /**
   * Per-document contamination stats against an evaluation set:
   * `n_grams` (distinct n-grams in the doc), `n_contaminated` (of those,
   * how many appear in the benchmark), `contaminated` (any overlap).
   * Every corpus row is returned — downstream picks a drop threshold.
   */
  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         n: Int = 13, hashGrams: Boolean = true): DataFrame = {
    val bench = broadcast(benchmarkNgrams(benchmark, textCol, n, hashGrams))
    val docGramsRaw = corpus.select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
    val docGrams =
      if (hashGrams) docGramsRaw.select(col(idCol), xxhash64(col("gram")).as("gram"))
      else docGramsRaw
    // count BEFORE the semi-join (total grams) and AFTER (matching grams) in
    // one pass: left-join against the broadcast set and sum the hit flag —
    // map-side combinable, one shuffle keyed on the doc id
    val hits = docGrams
      .join(bench.withColumn("__hit", lit(1)), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Drop corpus documents sharing more than `maxOverlap` distinct n-grams
    * with the benchmark (0 = any collision drops the doc). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 13, maxOverlap: Long = 0,
                    hashGrams: Boolean = true): DataFrame = {
    val dirty = contaminationStats(corpus, benchmark, idCol, textCol, n, hashGrams)
      .filter(col("n_contaminated") > maxOverlap)
      .select(col(idCol))
    // broadcast anti-join: the dirty-id set is small by the same assumption
    // that makes decontamination cheap (contamination is rare)
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }

  /**
   * FUZZY decontamination: training documents whose minhash-estimated
   * Jaccard against an eval document crosses `minMatching / numFuncs` —
   * the near-match complement of [[contaminationStats]]'s exact n-gram
   * collision, catching PARAPHRASED/reformatted eval leakage (whitespace
   * tweaks, re-punctuation, light edits) that exact 13-gram matching
   * misses entirely.
   *
   * Signatures are the ENGINE-PORTABLE md5-over-word-2-gram minima (the
   * d19 contract: per function k, sig = min over grams of
   * md5("k|" ++ gram), min by hex-string order), so an external oracle
   * replays the flagged pair set bit-for-bit. The fast production
   * variant of the same screen is [[Dedup.minhashLshAgainstIndex]] with
   * the eval set as the persisted index (xxhash64 signatures, banded
   * buckets) — use that at 100 TB; this formulation proves the
   * algorithm. Scale shape here: the eval side is small (eval sets are
   * thousands of docs) → its banded signatures BROADCAST; the corpus is
   * shingled in one narrow pass and the (k, sig) equi-join touches only
   * colliding signatures — no corpus self-join anywhere.
   *
   * @return (idCol, eval_id, n_matching) — one row per (train doc, eval
   *         doc) pair with `n_matching >= minMatching` of the `numFuncs`
   *         signature functions agreeing
   */
  def fuzzyContamination(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         numFuncs: Int = 8, minMatching: Int = 4): DataFrame =
    fuzzyContaminationAgainstSigs(corpus,
      bandedPortableSignatures(benchmark, "eval_id", idCol, textCol, numFuncs),
      idCol, textCol, numFuncs, minMatching)

  /** The portable (k, sig) banding of [[fuzzyContamination]], exposed so a
    * STATIC eval set is signed ONCE (checkpoint the result) instead of
    * per screening call — the streaming-ingest shape, where the eval set
    * changes rarely and every microbatch otherwise re-signs and
    * re-broadcasts it (s23 measured one extra job per batch on exactly
    * that). */
  def bandedPortableSignatures(df: DataFrame, outId: String,
                               idCol: String = "doc_id",
                               textCol: String = "text",
                               numFuncs: Int = 8): DataFrame = {
    // staged __toks (r13): inlining tokens(text) into the size filter and
    // the four slice/size references re-ran the split pass ~5x per doc
    // (the minhashSqlPairs lesson); Spread parallelizes the md5 transform
    // passes when the input is one unsplittable file (no-op at scale)
    val toks = col("__toks")
    val grams = array_distinct(zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b)))
    val sigs = (0 until numFuncs).map { k =>
      array_min(transform(col("__grams"), g => md5(concat(lit(s"$k|"), g))))
    }
    graft.util.Spread.ifNarrow(df.select(col(idCol).as(outId), col(textCol)))
      .select(col(outId), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(toks) > 1)
      .select(col(outId), grams.as("__grams"))
      .select(col(outId), posexplode(array(sigs: _*)).as(Seq("k", "sig")))
  }

  /** [[fuzzyContamination]] against ALREADY-SIGNED eval rows
    * (`(eval_id, k, sig)` from [[bandedPortableSignatures]]) — identical
    * output, one corpus pass, eval side broadcast as given. */
  def fuzzyContaminationAgainstSigs(corpus: DataFrame, evalSigs: DataFrame,
                                    idCol: String = "doc_id",
                                    textCol: String = "text",
                                    numFuncs: Int = 8,
                                    minMatching: Int = 4): DataFrame = {
    require(minMatching >= 1 && minMatching <= numFuncs,
      s"minMatching=$minMatching must be in [1, numFuncs=$numFuncs]")
    bandedPortableSignatures(corpus, idCol, idCol, textCol, numFuncs)
      .join(broadcast(evalSigs), Seq("k", "sig"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_matching"))
      .filter(col("n_matching") >= minMatching)
  }
}
