package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series gap filling: densify a per-key bucketed series to its full
 * bucket range and LINEARLY INTERPOLATE the missing interior buckets —
 * the resample/`interpolate` step every metrics warehouse and
 * feature-engineering pipeline runs on sparse series (sensor dropouts,
 * days with no events) before window features are computed over them.
 */
object GapFill {

  /**
   * Fill each key's series to the dense bucket spine [min, max] and
   * interpolate missing values between their observed neighbours:
   * `v = pv + (nv − pv) · (b − pb) / (nb − pb)` (pv/nv = previous/next
   * observed value, pb/nb their buckets). Spine edges are always observed
   * (the spine is per-key min..max), so every gap is interior and the
   * interpolation is total.
   *
   * Scale shape: the spine is one per-key min/max aggregate + a narrow
   * `sequence` explode (no join against a global calendar), and both
   * neighbour passes are two frames over ONE key-partitioned sort — a
   * single shuffle on the keys, reused by both windows and the output
   * order. Engine-portable by construction: the interpolation expression
   * is one fixed tree of IEEE ops over already-rounded inputs, so an
   * external oracle replays filled values bit-for-bit (q85).
   *
   * @param series one row per (keyCols, bucketCol) observation;
   *               bucketCol integral (day index, hour index, …)
   * @return (keyCols*, bucketCol, valueCol, filled) — dense; `filled`
   *         marks interpolated rows
   */
  def fillInterpolate(series: DataFrame, keyCols: Seq[String],
                      bucketCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "gap fill needs at least one key column")
    val keys = keyCols.map(col)
    val spine = series.groupBy(keys: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .select(keys :+ explode(sequence(col("__lo"), col("__hi"))).as(bucketCol): _*)
    val joined = spine.join(
      series.select(keys :+ col(bucketCol) :+ col(valueCol).as("__v"): _*),
      keyCols :+ bucketCol, "left")
    val ord = Window.partitionBy(keys: _*).orderBy(col(bucketCol))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
    joined
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__pb",
        last(when(col("__v").isNotNull, col(bucketCol)), ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nb",
        first(when(col("__v").isNotNull, col(bucketCol)), ignoreNulls = true).over(wNext))
      .withColumn("filled", col("__v").isNull)
      .withColumn(valueCol,
        when(col("__v").isNotNull, col("__v"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (col(bucketCol) - col("__pb")).cast("double") /
            (col("__nb") - col("__pb")).cast("double")))
      .select(keys ++ Seq(col(bucketCol), col(valueCol), col("filled")): _*)
  }

  /**
   * Exponentially-weighted moving average per key: fold the series in
   * (tsCol, tieCol) order through `e ← e·(1−α) + x·α`, seeded with the
   * first value — the standard smoothing a metrics/feature pipeline
   * applies before thresholding (EWMA control charts, de-noised
   * features). Engine-portable by construction: the fold order is
   * pinned and each step is ONE fixed IEEE op tree over already-rounded
   * inputs, so with a dyadic α (0.5, 0.25 — the x·α product is exact)
   * an external oracle replays the final smoothed value bit-for-bit
   * (the q91 gate).
   *
   * Scale shape: one groupBy collecting each key's series into a sorted
   * array — state is O(per-key series length), the right trade for
   * bounded per-entity histories (a user's events, a sensor's day); for
   * unbounded series use the windowed operators instead. One shuffle.
   */
  def ewma(series: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0, 1]")
    series.groupBy(keyCols.map(col): _*)
      .agg(aggregate(
        sort_array(collect_list(struct(col(tsCol), col(tieCol),
          col(valueCol).as("v")))),
        lit(null).cast("double"),
        (e, x) => when(e.isNull, x.getField("v"))
          .otherwise(e * (1 - alpha) + x.getField("v") * alpha)).as("ewma"))
  }

  /**
   * OHLC bar resample: downsample a (key, ts, value) tick series to
   * fixed-width time bars with open/high/low/close/volume per (key, bar)
   * — the canonical time-series downsampling (financial bars, sensor
   * rollups, metrics pre-aggregation before retention windows expire the
   * raw ticks). ONE map-side-combinable aggregate: open/close are
   * `min_by`/`max_by` picks on the timestamp, high/low plain extremes,
   * volume a count — every output is a PICK or an order-free extreme of
   * already-rounded doubles, never a float fold, so an external engine
   * replays bars bit-for-bit (the q89 gate). Pick determinism requires
   * `tsCol` unique within (key, bar) — true of event streams with
   * microsecond stamps; with ties, open/close become engine-dependent.
   *
   * Scale shape: one shuffle on (key, bar) with partial aggregation —
   * grouped-count cost at 100 TB; no window, no sort, no second scan.
   */
  def ohlcBars(ticks: DataFrame, keyCols: Seq[String], tsCol: String,
               valueCol: String, barWidth: String = "hour"): DataFrame = {
    val keys = keyCols.map(col)
    ticks.groupBy(keys :+ date_trunc(barWidth, col(tsCol)).as("bar_ts"): _*)
      .agg(
        min_by(col(valueCol), col(tsCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(tsCol)).as("close"),
        count(lit(1)).as("volume"))
  }
}
