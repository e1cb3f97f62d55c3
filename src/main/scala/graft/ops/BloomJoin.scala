package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-prefiltered semi/anti join — the 100 TB shuffle-avoidance pattern
 * for "keep the rows of a huge fact table whose key appears in a medium
 * dimension": when the dimension's key set is too big to broadcast-join as
 * a hash table but its BLOOM FILTER is not (a 100 M-key set at 1% fpp is
 * ~110 MB; at 0.1 it's ~60 MB), build the filter distributed
 * (`stat.bloomFilter` tree-aggregates per-partition filters), broadcast it
 * through the task closure, and drop non-matching fact rows BEFORE the
 * shuffle. The exact semi-join afterwards sees only `matches +
 * fpp · misses` rows — the filter removes ~`(1-fpp)` of the miss traffic
 * from the exchange. Result is IDENTICAL to the plain join (the Bloom
 * filter has no false negatives; the exact join clears false positives) —
 * which is what makes it oracle-checkable.
 *
 * This is the manual, composable form of what AQE's runtime row-level
 * filtering does for selective broadcast joins; having it as an operator
 * lets pipelines apply it where the optimizer can't see the opportunity
 * (pre-aggregated keys, reused filters across queries).
 */
object BloomJoin {

  /** `big` semi-joined to `small` on `bigKey == smallKey`, Bloom-prefiltered. */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame =
    prefiltered(big, small, bigKey, smallKey, expectedItems, fpp)
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")

  /** `big` anti-joined to `small`: rows the Bloom filter clears are
    * DEFINITE non-matches and bypass the join entirely; only the
    * `mightContain` rows (matches + false positives) join exactly. */
  def bloomAntiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val might = mightContainCol(big, small, bigKey, smallKey, expectedItems, fpp)
    big.filter(!might).unionByName(
      big.filter(might)
        .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_anti"))
  }

  /** Just the prefilter step (for pipelines that join later). */
  def prefiltered(big: DataFrame, small: DataFrame,
                  bigKey: String, smallKey: String,
                  expectedItems: Long, fpp: Double = 0.01): DataFrame =
    big.filter(mightContainCol(big, small, bigKey, smallKey, expectedItems, fpp))

  private def mightContainCol(big: DataFrame, small: DataFrame,
                              bigKey: String, smallKey: String,
                              expectedItems: Long, fpp: Double) = {
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    // the UDF closure serializes the filter once per executor (task
    // broadcast), not per row; mightContain is a handful of hash probes.
    // Longs probe the filter's long path (no boxing surprises: put/ probe
    // must agree on the type, and stat.bloomFilter puts integral types as
    // longs); everything else probes as its toString bytes like the put side
    val isIntegral = big.schema(bigKey).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (isIntegral) {
      val f = udf((k: java.lang.Long) => k != null && bloom.mightContainLong(k))
      f(col(bigKey).cast("long"))
    } else {
      val f = udf((k: String) => k != null && bloom.mightContainString(k))
      f(col(bigKey).cast("string"))
    }
  }
}
