package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/**
 * KMV (k-minimum-values) distinct sketches with SET-OPERATION estimates —
 * the piece HLL doesn't give us. An HLL union estimates |A∪B|, but
 * intersection/Jaccard only falls out by inclusion–exclusion, whose error
 * explodes when |A∩B| ≪ |A∪B|. A KMV sketch (the k smallest distinct hash
 * values of a set, Beyer et al., SIGMOD'07) supports a DIRECT resemblance
 * estimator: take the k smallest of A∪B (= k smallest of the two sketches'
 * union), count how many live in both sketches → ρ = c/k estimates the
 * Jaccard J(A,B), and ρ · D̂(A∪B) estimates the intersection size.
 *
 * Pipeline use case: contamination / overlap screening between corpus
 * shards — "how much does shard X's shingle set overlap shard Y's?" — at a
 * fixed k·|shards| memory cost, one scan, no pairwise shard joins over raw
 * data.
 *
 * Scale shape: the only full-data operation is one distinct on
 * (shard, hash). The min-k selection is TWO bounded keyed windows — a
 * salted pre-selection (per (shard, salt) top-k, so no single reducer ever
 * sorts a whole hot shard) followed by a top-k over the ≤ k·salts
 * survivors per shard. Everything after operates on ≤ k rows per shard.
 *
 * Portability: the hash is md5 of the value's decimal string — available
 * verbatim in any engine — and fixed-width lowercase hex compares
 * lexicographically in numeric order, so "k smallest hashes" needs no
 * hex→int conversion and the whole sketch (and every overlap count derived
 * from it) is reproducible bit for bit in a second engine.
 */
object Kmv {

  /** Portable uniform hash: lowercase md5 hex of the value's string form.
    * Fixed width ⇒ lexicographic order == numeric order. */
  def kmvHash(c: Column): Column = md5(c.cast("string"))

  /**
   * Per-shard KMV sketch: the `k` smallest distinct `kmvHash(value)`s, as a
   * sorted array column `kmv`. `salts` bounds the per-reducer sort: the
   * first window sorts at most ~|distinct|/salts rows per task.
   */
  def sketch(df: DataFrame, shardCol: String, valueCol: String,
             k: Int = 64, salts: Int = 16): DataFrame =
    sketchHashed(
      df.select(col(shardCol).as("shard"), kmvHash(col(valueCol)).as("h")),
      k, salts)

  /** [[sketch]] over already-hashed (shard, h) rows — also the MERGE of
    * previously built sketches (min-k is mergeable: explode sketches back
    * to (shard, h) and re-select; the streaming twin uses exactly this). */
  def sketchHashed(hashed: DataFrame, k: Int = 64, salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, s"k=$k salts=$salts must be positive")
    val h = hashed.filter(col("h").isNotNull).distinct()
    // salt is derived from the hash itself: deterministic, and uniform
    // because h already is. Survivors per shard: ≤ k·salts.
    val salted = h.withColumn("__salt", pmod(xxhash64(col("h")), lit(salts)))
    val w1 = Window.partitionBy("shard", "__salt").orderBy("h")
    val w2 = Window.partitionBy("shard").orderBy("h")
    salted
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("__r2", row_number().over(w2)).filter(col("__r2") <= k)
      .groupBy("shard")
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
  }

  /**
   * Pairwise shard overlap from sketches alone (no second pass over data):
   * for every shard pair a < b, `union_k` = |k smallest of kmv_a ∪ kmv_b|
   * and `both_k` = how many of those appear in BOTH sketches. The Jaccard
   * estimate is both_k/union_k (exposed as `jaccard_est`); hash-stable
   * gates should compare the integer counts.
   *
   * The join is sketch×sketch — |shards|² rows of ≤ 2k strings each; with
   * hundreds of shards this is broadcast-sized by construction.
   */
  def pairOverlap(sketches: DataFrame, k: Int = 64): DataFrame = {
    val a = sketches.select(col("shard").as("shard_a"), col("kmv").as("kmv_a"))
    val b = sketches.select(col("shard").as("shard_b"), col("kmv").as("kmv_b"))
    a.join(b, col("shard_a") < col("shard_b"))
      .withColumn("__u", slice(array_sort(array_union(col("kmv_a"), col("kmv_b"))), 1, k))
      .select(col("shard_a"), col("shard_b"),
        size(col("__u")).cast("long").as("union_k"),
        size(array_intersect(array_intersect(col("__u"), col("kmv_a")), col("kmv_b")))
          .cast("long").as("both_k"))
      .withColumn("jaccard_est", col("both_k").cast("double") / col("union_k"))
  }

  /** One-call convenience: sketch each shard of `df`, then estimate all
    * pairwise overlaps. Returns (shard_a, shard_b, union_k, both_k,
    * jaccard_est) ordered by the pair. */
  def shardOverlap(df: DataFrame, shardCol: String, valueCol: String,
                   k: Int = 64, salts: Int = 16): DataFrame =
    pairOverlap(sketch(df, shardCol, valueCol, k, salts), k)
      .orderBy("shard_a", "shard_b")
}
