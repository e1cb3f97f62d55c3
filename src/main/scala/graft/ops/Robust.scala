package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Robust per-group statistics: EXACT median and MAD (median absolute
 * deviation), and the classic robust outlier gate |x − med| > k·MAD.
 * Mean/stddev outlier tests break down exactly when you need them — the
 * outliers drag the mean and inflate σ (masking); the median/MAD pair has
 * a 50% breakdown point.
 *
 * Float-determinism contract (why this is hash-checkable across engines
 * when built-in percentiles are not): engines disagree on quantile
 * INTERPOLATION (a+(b−a)·f vs (a+b)/2 round differently), so instead the
 * median is computed structurally — row_number over the per-group sort,
 * pick the two middle ranks ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉ (equal when n is odd),
 * then sum(picked)/count(picked). Every step is a single correctly-rounded
 * IEEE operation on identical operands in any engine: one add, one divide.
 * The deviations |x − med|, the second median over them, the k·MAD product
 * and the comparison are likewise single IEEE ops — the whole statistic is
 * bit-identical wherever IEEE doubles are (everywhere), with no
 * transcendental in sight.
 *
 * Scale shape: two keyed window sorts per group (the unavoidable cost of
 * exact order statistics), fully parallel across groups; the per-group
 * medians are one row per group and broadcast back. For a single giant
 * group — where any exact median degenerates to one sorted partition —
 * use `approx_percentile` and accept sketch error; this operator is for
 * the many-groups shape.
 */
object Robust {

  /** Exact per-group median of `xCol` (nulls dropped): one keyed sort, one
    * agg. Returns (groupCols*, `outCol`). */
  def exactMedian(df: DataFrame, groupCols: Seq[String], xCol: String,
                  outCol: String = "med"): DataFrame =
    medianOf(df.filter(col(xCol).isNotNull), groupCols, col(xCol).cast("double"), outCol)

  private def medianOf(df: DataFrame, groupCols: Seq[String], x: Column,
                       outCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(x)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__x", x)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      // middle ranks: ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉ = ⌊(n+2)/2⌋ (1-indexed;
      // floor() because Spark's / on integers is double division)
      .filter(col("__rn") === floor((col("__n") + 1) / 2) ||
              col("__rn") === floor((col("__n") + 2) / 2))
      .groupBy(groupCols.map(col): _*)
      // odd n: one row, sum/1; even n: (a+b)/2 — one rounded add, one
      // exact-or-rounded divide, same everywhere
      .agg((sum(col("__x")) / count(lit(1))).as(outCol))
  }

  /**
   * Per-group LOWER WEIGHTED MEDIAN with integer weights: the smallest x
   * whose cumulative weight reaches half the group total (2·cumw ≥ W —
   * pure integer comparison, no halving float). Ties on x are collapsed
   * BEFORE the cumulative pass (one groupBy on (group, x)), so the result
   * is deterministic regardless of row order within equal x — and the
   * cumulative window then runs over distinct x values, not raw rows.
   * All-integer ⇒ hash-portable across engines.
   */
  def weightedMedian(df: DataFrame, groupCols: Seq[String], xCol: String,
                     wCol: String, outCol: String = "wmed"): DataFrame = {
    val perX = df.filter(col(xCol).isNotNull)
      .groupBy((groupCols :+ xCol).map(col): _*)
      .agg(sum(col(wCol).cast("long")).as("__w"))
    val wOrd = Window.partitionBy(groupCols.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    perX
      .withColumn("__cw", sum(col("__w")).over(wOrd))
      .withColumn("__W", sum(col("__w")).over(wAll))
      .filter(col("__cw") * 2 >= col("__W"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(xCol)).as(outCol))
  }

  /**
   * Per-group robust summary: median, MAD, total `n`, and how many rows
   * fail the |x − med| > k·MAD gate (`n_outliers`). A group whose MAD is 0
   * (over half the values identical) flags every row off the median —
   * the textbook caveat, kept as-is for fidelity to the definition.
   */
  def madOutliers(df: DataFrame, groupCols: Seq[String], xCol: String,
                  k: Double = 3.0): DataFrame = {
    val in = df.filter(col(xCol).isNotNull)
      .select(groupCols.map(col) :+ col(xCol).cast("double").as("__x"): _*)
    val med = exactMedian(in, groupCols, "__x", "med")
    val withMed = in.join(med, groupCols)
      .withColumn("__dev", abs(col("__x") - col("med")))
    val mad = medianOf(withMed, groupCols, col("__dev"), "mad")
    withMed.join(mad, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /**
   * Theil-Sen robust trend (Theil 1950 / Sen 1968) per group: the LOWER
   * MEDIAN of all pairwise slopes of an integer (h, x) series — the
   * outlier-proof complement to least squares (one wild point cannot move
   * it). Each slope is ONE IEEE divide of exact longs; the median is a
   * structural rank-pick at (n−1)/2 over the per-group slope sort
   * (deterministic — no averaging), so the result hash-checks across
   * engines. Returns (groupCol, n_pairs, slope_med rounded to 4).
   *
   * The estimator is O(n²) pairs per group BY DEFINITION, so `maxPoints`
   * LOUD-fails on a group whose point count would make the pair join
   * pathological (the [[Graph.linkPrediction]] maxDegree contract): window
   * the series upstream — a silent cap would bias the slope.
   */
  def theilSen(points: DataFrame, groupCol: String, hCol: String,
               xCol: String, maxPoints: Int = 10000): DataFrame = {
    require(maxPoints >= 2, s"maxPoints=$maxPoints must be >= 2")
    val series = points.select(col(groupCol), col(hCol).cast("long").as("__h"),
        col(xCol).cast("long").as("__x"))
      .localCheckpoint() // bounded probe + both sides of the pair self-join
    val hot = series.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxPoints).limit(1).collect()
    require(hot.isEmpty,
      s"theilSen: group ${hot.headOption.map(_.get(0)).orNull} has more than " +
        s"maxPoints=$maxPoints points — the pairwise-slope self-join is O(n²) " +
        "per group; window the series upstream or raise the bound")
    val pairs = series.as("a").join(series.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col("a.__h") < col("b.__h"))
      .select(col(s"a.$groupCol").as(groupCol),
        ((col("b.__x") - col("a.__x")).cast("double") /
          (col("b.__h") - col("a.__h")).cast("double")).as("slope"))
    val w = Window.partitionBy(groupCol).orderBy("slope")
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .filter(col("__rn") === expr("(__n - 1) div 2 + 1")) // lower median
      .select(col(groupCol), col("__n").as("n_pairs"),
        round(col("slope"), 4).as("slope_med"))
  }
}
