package graft.llm

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus cleaning for LLM training data: the standard
 * quality-filter → exact-dedup → near-dedup → language-filter chain,
 * composed from the individual operators ([[TextAnalysis]], [[Dedup]]) so a
 * user gets the whole pipeline as one call while each stage stays
 * independently testable.
 *
 * Scale shape: stages 1 (quality) and 4 (language) are narrow codegen'd
 * projections; stage 2 (exact dedup) shuffles once on the text hash; stage 3
 * (near-dup) is the MinHash-LSH bucket join (output-bound, skew-capped) plus
 * a left-anti join on the drop list. Nothing is collected to the driver and
 * no stage is O(n²).
 *
 * @param minChars         drop docs shorter than this many characters
 * @param minTokens        drop docs with fewer whitespace tokens
 * @param maxPunctRatio    drop docs with a higher punctuation ratio
 * @param keepLangs        keep only docs whose predicted language is in the
 *                         set (empty set = no language filter; docs with an
 *                         ambiguous/unknown prediction are dropped when the
 *                         filter is active)
 * @param nearDup          also remove MinHash-LSH near-duplicates (keeps the
 *                         least id of each candidate pair at or above
 *                         `minEstJaccard`)
 */
case class CorpusCleanConfig(
    minChars: Int = 50,
    minTokens: Int = 10,
    maxPunctRatio: Double = 0.25,
    keepLangs: Set[String] = Set.empty,
    nearDup: Boolean = true,
    minEstJaccard: Double = 0.8,
    minhashShingle: Int = 5,
    minhashHashes: Int = 64,
    minhashBands: Int = 16)

object CorpusPipeline {

  /**
   * Clean `docs`, returning the surviving rows with the quality metrics and
   * `lang_pred` attached. Deterministic: identical inputs produce identical
   * survivor sets (all tie-breaks are by minimum id).
   */
  def clean(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            cfg: CorpusCleanConfig = CorpusCleanConfig()): DataFrame = {
    // 1. quality filter — one narrow projection, then codegen'd predicates
    val measured = TextAnalysis.qualityMetrics(docs, textCol)
      .filter(col("n_chars_computed") >= cfg.minChars &&
        col("n_tokens") >= cfg.minTokens &&
        col("punct_ratio") <= cfg.maxPunctRatio)

    // 2. exact dedup — keep the minimum id of each identical-text group
    val exactKept = Dedup.exactDeduped(measured, idCol, F.xxhash64(col(textCol)))

    // 3. near-dup removal — for every candidate pair (id_a < id_b) at or
    // above the similarity floor, drop id_b: each surviving doc is the least
    // id of its pair neighborhood. Left-anti join, no driver collect.
    val nearKept = if (!cfg.nearDup) exactKept else {
      val drops = Dedup.minhashLsh(exactKept, idCol, textCol = textCol,
          shingleSize = cfg.minhashShingle, numHashes = cfg.minhashHashes,
          bands = cfg.minhashBands, minEstJaccard = cfg.minEstJaccard)
        .select(col("id_b").as(idCol)).distinct()
      exactKept.join(drops, Seq(idCol), "left_anti")
    }

    // 4. language ID + optional filter
    val withLang = TextAnalysis.withLangId(nearKept, textCol)
    if (cfg.keepLangs.isEmpty) withLang
    else withLang.filter(col("lang_pred").isin(cfg.keepLangs.toSeq: _*))
  }

  /**
   * Streaming corpus cleaning — the ingestion-time variant: quality and
   * language stages are stateless projections (streaming-safe as-is); exact
   * dedup becomes `dropDuplicates` on the text hash against the checkpointed
   * state store (the first-arrived duplicate wins — arrival order replaces
   * the batch min-id rule). Near-dup removal needs a corpus self-join, so it
   * stays a batch compaction pass ([[clean]] with `nearDup = true`) — the
   * standard stream-ingest + periodic-compact split.
   */
  def cleanStream(docs: DataFrame, textCol: String = "text",
                  cfg: CorpusCleanConfig = CorpusCleanConfig(nearDup = false)): DataFrame = {
    require(!cfg.nearDup,
      "near-dup removal requires a corpus self-join; run clean() as a batch compaction instead")
    val measured = TextAnalysis.qualityMetrics(docs, textCol)
      .filter(col("n_chars_computed") >= cfg.minChars &&
        col("n_tokens") >= cfg.minTokens &&
        col("punct_ratio") <= cfg.maxPunctRatio)
    val deduped = measured.withColumn("__fp", F.xxhash64(col(textCol)))
      .dropDuplicates("__fp").drop("__fp")
    val withLang = TextAnalysis.withLangId(deduped, textCol)
    if (cfg.keepLangs.isEmpty) withLang
    else withLang.filter(col("lang_pred").isin(cfg.keepLangs.toSeq: _*))
  }
}
