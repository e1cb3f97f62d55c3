package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact per-group OLS trend over integer-quantized inputs, as a RATIONAL:
 * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) and intercept = (Σy·Σx² −
 * Σx·Σxy) / same-denominator, emitted as integer numerator/denominator
 * pairs instead of divided-out doubles.
 *
 * Why rational: float sums of arbitrary doubles are order-dependent and
 * NOT reproducible across engines (see PERF.md's float-determinism note) —
 * but with x and y quantized to integers, every Σ is an exact integer,
 * the numerators/denominators are exact integers, and the whole trend
 * statistic is hash-checkable bit for bit. The caller divides at the edge
 * if a double slope is wanted.
 *
 * Scale shape: ONE map-side-combinable aggregate (five sums) — the same
 * single-pass shape as any `groupBy().agg()`, no window, no second scan.
 * Overflow: the five sums are 64-bit and Spark runs ANSI mode, so a
 * group whose n·Σxy exceeds 2⁶³ fails loud, not wrong — at that scale
 * switch the sums to `decimal(38,0)` (both engines' 128-bit path) at the
 * cost of decimal-vs-int hash portability.
 */
object Regression {

  /** Per-group exact OLS: returns (groupCols*, n, sum_x, sum_y, slope_num,
    * slope_den, intercept_num) — slope = slope_num/slope_den, intercept =
    * intercept_num/slope_den. A group with all-equal x has slope_den 0
    * (undefined trend) — kept, caller decides. `xCol`/`yCol` must already
    * be integral. Rows with a null x or y are dropped INSIDE the operator:
    * `count` would otherwise include rows the null-skipping `sum`s don't,
    * making (n, Σ) inconsistent and the slope silently wrong. */
  def exactOlsRational(df: DataFrame, groupCols: Seq[String],
                       xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .select(groupCols.map(col) ++ Seq(
        col("n"), col("sum_x"), col("sum_y"),
        (col("n") * col("__sxy") - col("sum_x") * col("sum_y")).as("slope_num"),
        (col("n") * col("__sxx") - col("sum_x") * col("sum_x")).as("slope_den"),
        (col("sum_y") * col("__sxx") - col("sum_x") * col("__sxy"))
          .as("intercept_num")): _*)
  }
}
