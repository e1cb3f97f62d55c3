package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus sampling and batching operators for training-data pipelines:
 *
 *  - [[hashSample]]        deterministic (repeatable) stratified sampling
 *  - [[seqPack]]           token-budget sequence packing (contiguous greedy)
 *  - [[mixtureWeights]]    temperature-based mixture weights per stratum
 *
 * All three are the standard knobs between "cleaned corpus" and "training
 * batches": subsample per domain/language, re-balance with a temperature,
 * pack documents into fixed token budgets.
 */
object Sampling {

  /**
   * Deterministic hash sampling: keep a row iff
   * `((id & 0x7fffffff) * 2654435761) mod 1000 < permille`. Knuth's
   * multiplicative hash — pure integer arithmetic, so the SAME rows are kept
   * on every engine and every run (unlike `df.sample`, whose RNG is
   * partition-dependent), which makes downsampling reproducible and
   * joinable: two tables sampled on the same key keep aligned rows.
   * `permille` may be a per-row expression — stratified rates (e.g. by
   * language) are just a CASE.
   *
   * The 31-bit mask keeps the product inside a 64-bit long for ANY id
   * (negative or 64-bit — e.g. xxhash64-derived keys): without it the
   * multiplication overflows (an error under ANSI/DuckDB, a silent wrap
   * elsewhere) and `%` vs `pmod` diverge on negatives, breaking the
   * cross-engine contract exactly where it matters. Ids equal mod 2^31
   * sample together — irrelevant for rate sampling.
   *
   * Narrow filter, no shuffle, pushes past projections; at 100 TB the sample
   * rate is applied at scan speed.
   */
  def hashSample(df: DataFrame, id: Column, permille: Column): DataFrame =
    df.filter(
      pmod(id.bitwiseAND(lit(0x7fffffffL)) * lit(2654435761L), lit(1000L)) < permille)

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis "A-ES"
   * exponential keys): per stratum, keep the `k` rows with the largest
   * u^(1/w) — equivalently the largest ln(u)/w — which draws each row with
   * probability proportional to its weight, without replacement. The
   * uniform u is DETERMINISTIC (Knuth multiplicative hash of the id; the
   * +0.5 offset and the dyadic 2³¹ divisor make u ∈ (0,1) exactly
   * representable), so the sample is reproducible across runs AND across
   * engines — the d29 oracle recomputes the identical sample in DuckDB.
   * Zero/negative weights are never sampled (E-S semantics). One window
   * per stratum — strata parallelize, no global sort.
   */
  def weightedSample(df: DataFrame, id: Column, strataCols: Seq[String],
                     weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = pmod(id.bitwiseAND(lit(0x7fffffffL)) * lit(2654435761L), lit(2147483648L))
    val u = (h.cast("double") + lit(0.5)) / lit(2147483648.0)
    // ranking key only — never hash ln output (StrictMath vs libm, 1 ulp);
    // two DIFFERENT rows' keys landing within 1 ulp does not happen
    val key = log(u) / weight.cast("double")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(key.desc, id)
    df.filter(weight > 0)
      .withColumn("__aes_rk", row_number().over(w))
      .filter(col("__aes_rk") <= k)
      .drop("__aes_rk")
  }

  /**
   * Token-budget sequence packing: orders rows by `orderCol` within each
   * `partitionCols` group and assigns `bin_id = floor(running_tokens_before /
   * capacity)` — the contiguous greedy packing used to batch documents into
   * fixed-size training sequences (each bin's token total overshoots
   * `capacity` by at most one document; true bin packing is NP-hard and
   * needless here).
   *
   * Scale design: packing only needs LOCAL contiguity, so the running sum is
   * windowed per partition key (language, shard, …) — independent keys pack
   * in parallel and no global total order exists. For a single giant stratum,
   * pre-split it into salted shards first; bins are equally valid within any
   * shard. Integer arithmetic end to end.
   */
  def seqPack(df: DataFrame, partitionCols: Seq[String], orderCol: String,
              tokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__before div $capacity"))
      .drop("__before")
  }

  /**
   * Sliding-window chunk spans: one row per (row, chunk) with `chunk_id`,
   * `token_start`, `chunk_len` — the windowing step ahead of embedding or
   * sequence training (window 512 / stride 384 → 128-token overlap). Spans
   * are METADATA (token units); the downstream tokenizer/encoder slices with
   * them, so this layer never copies text. Chunks start every `stride`
   * tokens while tokens beyond the previous window remain; the final chunk
   * is short rather than padded, and no chunk is emitted whose tokens were
   * all covered by the previous window.
   *
   * Narrow generate (`posexplode` over an integer `sequence`) — output rows
   * ≈ total_tokens / stride, no shuffle, pure integer arithmetic.
   */
  def chunkSpans(df: DataFrame, tokensCol: String, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window (stride > window would skip tokens)")
    df.withColumn("__n", col(tokensCol).cast("long"))
      // chunks = 1 + ceil(max(n - window, 0) / stride), integral (`div`
      // stays in longs; Column./ is fractional)
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          expr(s"(greatest(__n - $window, 0L) + ${stride - 1}) div $stride"))))
      .withColumn("token_start", col("chunk_id") * stride)
      .withColumn("chunk_len", least(lit(window.toLong), col("__n") - col("token_start")))
      .drop("__n")
  }

  /**
   * Fixed-SIZE stratified sample: exactly `n` rows per stratum (fewer if the
   * stratum is smaller), chosen by ranking on a hash of the id — the
   * deterministic, engine-portable stand-in for per-group reservoir
   * sampling. Unlike the rate-based [[hashSample]], the output size per
   * stratum is exact, which is what evaluation sets and per-language dev
   * splits need.
   *
   * One shuffle on the stratum keys; the rank window is per-stratum, so
   * strata sample in parallel. A hot stratum degrades to one sorted
   * partition — acceptable because `n` rows survive anyway; pre-filter with
   * [[hashSample]] first when a stratum is pathologically large.
   */
  def stratifiedFixedSample(df: DataFrame, keyCols: Seq[String], id: Column,
                            n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(md5(id.cast("string")), id)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n).drop("__rank")
  }

  /**
   * Per-stratum quantile filter (the "drop the bottom quartile by quality
   * score within each language" curation step): keeps rows with
   * `scoreCol >= quantile_q(scoreCol)` of their stratum; the per-stratum
   * thresholds are broadcast-joined back — two passes over the data, no
   * sort of the full corpus.
   *
   * `exact = true` uses Spark's exact interpolated `percentile`, whose
   * aggregation buffer is O(distinct score values) per stratum — right for
   * DISCRETE scores (token counts, integer ratings) and for cross-engine
   * bit-reproducibility (with dyadic `q`: 0.25/0.5/0.75). For continuous
   * scores at corpus scale pass `exact = false`: `approx_percentile` keeps
   * a bounded sketch per stratum instead.
   */
  def quantileFilter(df: DataFrame, keyCols: Seq[String], scoreCol: String,
                     q: Double, exact: Boolean = true): DataFrame = {
    require(q > 0 && q < 1, "q must be in (0, 1)")
    val agg = if (exact) s"percentile($scoreCol, $q)"
              else s"approx_percentile($scoreCol, $q, 10000)"
    val thresholds = df.groupBy(keyCols.map(col): _*)
      .agg(expr(agg).as("__thresh"))
    df.join(broadcast(thresholds), keyCols)
      .filter(col(scoreCol) >= col("__thresh")).drop("__thresh")
  }

  /**
   * Temperature-based mixture weights per stratum (the multilingual-corpus
   * re-balancing rule: sample stratum `l` proportionally to `n_l^alpha`,
   * alpha < 1 upweights the tail): returns one row per key with `n_rows` and
   * `weight = n^alpha / sum_l n^alpha`.
   *
   * Determinism: the denominator is a SEQUENTIAL fold over the per-key terms
   * in key order (`array_sort` + `aggregate` on the collected struct list),
   * not a parallel `sum` — float addition isn't associative, and a fixed
   * fold order makes the weights bit-reproducible across runs and engines.
   * For `alpha = 0.5` the term is IEEE-exact `sqrt`; other alphas go through
   * `pow`, which is correctly-rounded on the JVM but not guaranteed
   * bit-identical to other engines' libm.
   *
   * The per-key count aggregation is the only full-data pass (the post-agg
   * frame is cached, so deriving the denominator does not re-scan the
   * input); the fold runs over one tiny array (|keys| elements) broadcast
   * back to the counts.
   */
  def mixtureWeights(df: DataFrame, keyCol: String, alpha: Double = 0.5): DataFrame = {
    val term: Column => Column =
      if (alpha == 0.5) sqrt(_) else pow(_, lit(alpha))
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .withColumn("__term", term(col("n_rows").cast("double")))
      .cache()
    val denom = counts.agg(
      aggregate(
        array_sort(collect_list(struct(col(keyCol).as("k"), col("__term").as("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("__denom"))
    counts.crossJoin(broadcast(denom))
      .withColumn("weight", col("__term") / col("__denom"))
      .drop("__term", "__denom")
  }

  /**
   * DSIR-flavored importance ranking over HASHED n-gram features (Xie et
   * al., "Data Selection for Language Models via Importance Resampling",
   * 2023 — the hashed-feature half; the log-ratio weight is replaced by a
   * ratio-of-masses score so the statistic stays rational): feature =
   * 3-hex-char md5 bucket of each token (4096 buckets — portable to any
   * engine as a STRING key, no hex→int cast), `t_mass` = Σ_f c_{d,f}·T_f
   * and `r_mass` = Σ_f c_{d,f}·R_f where T/R are the target/raw corpus
   * bucket frequencies. Docs whose token mass concentrates in
   * target-heavy buckets score near 1, off-target docs near the target's
   * corpus share — and both masses are exact integers, so the score
   * (one IEEE divide) and the (score desc, id) top-k are deterministic
   * across engines.
   *
   * Scale shape: the tokenize+explode pass — the expensive corpus scan —
   * runs ONCE: it folds straight into a (doc, target, bucket) count that
   * is materialized (localCheckpoint), and BOTH the 4096-row bucket stats
   * and the doc-keyed mass sums derive from that count. Then one
   * broadcast join back and TakeOrdered for the top-k. Nothing shuffles
   * wider than (doc, bucket).
   */
  def hashedImportanceTopK(df: DataFrame, idCol: String, textCol: String,
                           isTarget: Column, k: Int = 100): DataFrame = {
    val toks = df.select(col(idCol).as(idCol), isTarget.as("__t"),
        explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .withColumn("__f", substring(md5(col("__w")), 1, 3))
    // __t is doc-constant, so (id, __t, __f) groups = (id, __f) groups;
    // checkpointing here bounds the corpus scan to one execution
    val perDoc = toks.groupBy(col(idCol), col("__t"), col("__f"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val stats = perDoc.groupBy("__f").agg(
      sum(col("__c")).as("__r_cnt"),
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__t_cnt"))
    perDoc
      .join(broadcast(stats), "__f")
      .groupBy(col(idCol))
      .agg(sum(col("__c") * col("__t_cnt")).as("t_mass"),
        sum(col("__c") * col("__r_cnt")).as("r_mass"))
      .withColumn("score", col("t_mass").cast("double") / col("r_mass"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /**
   * Rendezvous (highest-random-weight, Thaler & Ravishankar 1998) shard
   * assignment: each key goes to the shard with the maximal
   * `md5(key:shard)` — deterministic everywhere, uniform, and MINIMALLY
   * DISRUPTIVE under resizing: growing `n → n+1` moves a key iff the new
   * shard wins its rendezvous, so exactly ~1/(n+1) of keys move and
   * every mover lands ON the new shard (the property that makes
   * re-sharding a 100 TB corpus an incremental copy instead of a full
   * rewrite; consistent hashing's ring gives the same bound with worse
   * balance). One narrow explode (n rows per key, n = shard count, tiny)
   * + one keyed max_by — no shuffle beyond the aggregation.
   */
  def hrwShard(df: DataFrame, idCol: String, nShards: Int,
               outCol: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be positive")
    df.select(col(idCol),
        explode(array((0 until nShards).map(lit(_)): _*)).as("__sh"))
      .withColumn("__w", md5(concat_ws(":", col(idCol), col("__sh"))))
      .groupBy(col(idCol))
      .agg(max_by(col("__sh"), col("__w")).as(outCol))
  }
}
