package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal operators: forecast-over-forecast deltas (SURVEY.md J15) and
 * per-group ordered firsts (W2/W7), plus top-k (W1).
 */
object Deltas {

  /**
   * As-of self-join along the forecast axis (reference reports.py:195-207,
   * 627-629): for every (partition, forecast_time) row attach the metrics of
   * the row exactly one forecast step earlier. Expressed as `lag` over a
   * window — one shuffle on the partition keys, no self-join. Rows whose
   * predecessor is missing (first forecast, or a gap ≠ step) get nulls,
   * matching the reference's "previous report not found → change fields None".
   */
  def withPrevious(df: DataFrame, partitionCols: Seq[String], timeCol: String,
                   metricCols: Seq[String], stepHours: Int = graft.pipeline.Constants.ForecastStepHours,
                   prefix: String = "prev_"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(timeCol))
    val lagged = metricCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"$prefix$c", lag(col(c), 1).over(w))
    }.withColumn("__prev_t", lag(col(timeCol), 1).over(w))
    // only accept the predecessor if it is exactly one step earlier
    val exact = col("__prev_t") === col(timeCol) - expr(s"INTERVAL $stepHours HOURS")
    metricCols.foldLeft(lagged) { (d, c) =>
      d.withColumn(s"$prefix$c", when(exact, col(s"$prefix$c")))
    }.drop("__prev_t")
  }

  /** Percent change with the reference's direction convention
    * (reports.py:380-391): null when previous is null or 0. */
  def percentChange(current: Column, previous: Column): Column =
    when(previous.isNull || previous === 0, lit(null))
      .otherwise((current - previous) / previous * 100.0)

  /** Top-K rows by a column (W1, reports.py:708-732 nlargest(5)). */
  def topK(df: DataFrame, byCol: String, k: Int): DataFrame =
    df.orderBy(col(byCol).desc).limit(k)

  /** First row per key by an ordering (W2, drop_duplicates keep='first'). */
  def firstPerKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Argmax per group (W3, idxmax): row with max `valueCol` per key. */
  def argmaxPerKey(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    firstPerKey(df, keyCols, Seq(col(valueCol).desc))
}
