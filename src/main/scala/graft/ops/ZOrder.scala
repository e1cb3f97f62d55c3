package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) multi-dimensional data clustering — the data-layout
 * technique behind lakehouse `OPTIMIZE ZORDER BY`: rows sorted by the
 * bit-interleaved key place near-neighbors in BOTH dimensions into the same
 * files, so per-file min/max column statistics prune two-dimensional
 * predicates (a linear sort on one column leaves the other column's
 * per-file ranges spanning the whole domain — no pruning).
 *
 * At 100 TB this is a WRITE-side operator: one `repartitionByRange` on the
 * z-value (range exchange, sampling-based bounds) + an in-partition sort,
 * then every downstream scan with predicates on either dimension skips
 * files. Pure integer bit arithmetic — reproducible everywhere.
 */
object ZOrder {

  /** Morton interleave of two non-negative ints, `bits` bits each:
    * bit i of `x` lands at position 2i+1, bit i of `y` at 2i.
    * Inputs must already be < 2^bits (mask or quantize first). */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Production write path: cluster `df` into `numFiles` range partitions
    * of the z-value and sort within each — every output file covers a
    * compact z-range, hence a bounded rectangle union in (x, y). */
  def zOrdered(df: DataFrame, x: Column, y: Column,
               numFiles: Int, bits: Int = 16): DataFrame = {
    val withZ = df.withColumn("__z", zValue2(x, y, bits))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** The pruning evidence, as a deterministic query: bucket the z-sorted
    * rows into `nBuckets` equal "files" (exact SQL-ntile semantics over
    * the total z order — the oracle-stable stand-in for
    * repartitionByRange's sampled bounds) and report each bucket's
    * per-dimension min/max/count — the file-stats table a scan would
    * prune with. The global rank comes from [[GlobalRank.withGlobalRank]]
    * (range partitions + broadcast offsets), NOT a single-task ntile
    * window, and the bucket id is reconstructed from (rank, N) with the
    * exact integer ntile rule: the first N mod k buckets hold
    * ⌈N/k⌉ rows, the rest ⌊N/k⌋ — bit-identical to SQL ntile. */
  def zBucketStats(df: DataFrame, x: Column, y: Column,
                   tieBreak: Seq[Column], nBuckets: Int, bits: Int = 16): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be positive")
    val ranked = GlobalRank.withGlobalRank(
      df.withColumn("__z", zValue2(x, y, bits)),
      "__r", col("__z") +: tieBreak: _*)
    // one cheap count over the already-checkpointed ranked frame
    val n = ranked.count()
    val (q, rem) = (n / nBuckets, n % nBuckets)
    val cut = rem * (q + 1) // ranks 1..cut live in the (q+1)-sized buckets
    val bucket = // `div` = exact integer division (Column./ widens to double)
      if (q == 0L) col("__r") // fewer rows than buckets: one row per bucket
      else when(col("__r") <= lit(cut),
          expr(s"(__r - 1) div ${q + 1}L") + 1)
        .otherwise(lit(rem) + expr(s"(__r - ${cut}L - 1) div ${q}L") + 1)
    ranked.withColumn("bucket", bucket.cast("int"))
      .groupBy(col("bucket"))
      .agg(min(x).as("x_min"), max(x).as("x_max"),
        min(y).as("y_min"), max(y).as("y_max"),
        count(lit(1)).as("n"))
  }
}
