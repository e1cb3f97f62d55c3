package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed 2-D skyline (Pareto frontier): rows not dominated by any
 * other row, where (x', y') dominates (x, y) iff x' ≤ x ∧ y' ≤ y and at
 * least one is strict (both dimensions minimized). Duplicated points do
 * not dominate each other — all copies of a frontier point survive.
 *
 * The naive formulation is an O(n²) self-join. This is the
 * partition-and-merge plan (the distributed analogue of the sort-filter
 * skyline in Börzsönyi et al., ICDE'01):
 *
 *   1. equi-width bucket on x (bounds from ONE tiny min/max aggregate —
 *      no global sort, no driver data);
 *   2. per-bucket local skyline with two windows keyed on the bucket:
 *      a range-frame running min of y over STRICTLY smaller x (the
 *      range frame excludes x-ties, which a row frame can't), plus a
 *      per-(bucket, x) min to resolve same-x dominance;
 *   3. cross-bucket merge: a row also survives every earlier bucket iff
 *      y < (cumulative min y of all lower buckets) — earlier buckets hold
 *      strictly smaller x, so ≤ on y is domination. The cumulative min
 *      frame is |buckets| rows; it broadcasts back onto the survivors.
 *
 * Every shuffle is keyed on the bucket (parallel across buckets, AQE can
 * split a hot one); nothing driver-side exceeds the bucket count. At
 * 100 TB the local-skyline stage discards the overwhelming share of rows
 * before the (broadcast) merge join.
 *
 * Null x or y rows are dropped — domination is undefined on missing
 * coordinates.
 */
object Skyline {

  /** Pareto frontier of `df` minimizing (`xCol`, `yCol`). Both columns must
    * be numeric. Returns the input rows (original schema) that are on the
    * frontier. */
  def pareto2d(df: DataFrame, xCol: String, yCol: String,
               buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val in = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val Array(row) = in.agg(min(x), max(x)).collect() // bounded: 2 scalars
    if (row.isNullAt(0)) return in                    // empty input
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    val width = (hi - lo) / buckets
    val bucket =
      if (width == 0d) lit(0)
      else least(floor((x - lit(lo)) / lit(width)), lit(buckets - 1)).cast("int")
    val withB = in.withColumn("__b", bucket)

    // local skyline inside each bucket. "Strictly smaller x" needs a rank
    // indirection: a range frame's -1 bound is VALUE-based (x ≤ cur−1 —
    // wrong for fractional x), but on dense_rank(x) the same frame is
    // exactly "all rows of every smaller x value".
    val wRank = Window.partitionBy("__b").orderBy(x)
    val wPrevX = Window.partitionBy("__b").orderBy("__xr")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(col("__b"), x)
    val local = withB
      .withColumn("__xr", dense_rank().over(wRank))
      .withColumn("__minPrev", min(y).over(wPrevX))
      .withColumn("__minSame", min(y).over(wSameX))
      // smaller-x row with y ≤ ours dominates (strict on x); same-x row
      // with strictly smaller y dominates; exact duplicates survive
      .filter((col("__minPrev").isNull || y < col("__minPrev")) &&
        y === col("__minSame"))
      .drop("__xr")

    // cross-bucket merge: cumulative min y of all STRICTLY lower buckets.
    // |buckets| rows — the window and the join back are broadcast-cheap.
    val bMins = withB.groupBy("__b").agg(min(y).as("__bMin"))
    val wCum = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = bMins.withColumn("__cumMin", min(col("__bMin")).over(wCum))
      .select(col("__b"), col("__cumMin"))
    local.join(broadcast(cum), Seq("__b"))
      .filter(col("__cumMin").isNull || y < col("__cumMin"))
      .drop("__b", "__minPrev", "__minSame", "__cumMin")
  }
}
