package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval-set operators over integer (epoch-microsecond) spans.
 *
 * [[unionCoverage]] is the classic sweep: total covered length of a set of
 * possibly-overlapping intervals per key (sensor uptime, session coverage,
 * SLA windows). The naive formulation — one window partition per key
 * ordered by start — serializes each key on a single task and dies when a
 * key holds months of data, so the scale shape here SLICES every interval
 * at fixed boundaries first (default: UTC days). Union length is additive
 * across disjoint slices, so the per-(key, slice) sweeps are exact and the
 * parallelism is (keys × slices), not keys. Intervals may span any number
 * of slices (the explode emits one clamped segment per crossed boundary).
 *
 * All arithmetic is int64 microseconds — no float anywhere — so an
 * external engine replays the slicing, the running-max sweep, and the
 * clamped contributions bit-for-bit (the q94 gate).
 */
object Intervals {

  /**
   * Total union length per key over `[stCol, enCol)` int64 spans.
   * `sliceUs` is the slicing granularity (default one UTC day); zero-width
   * boundary segments contribute 0 and cannot affect the sum.
   */
  def unionCoverage(df: DataFrame, keyCols: Seq[String], stCol: String,
                    enCol: String, sliceUs: Long = 86400000000L): DataFrame = {
    require(keyCols.nonEmpty, "unionCoverage: need at least one key column")
    require(sliceUs > 0, s"unionCoverage: sliceUs=$sliceUs must be positive")
    val k = keyCols.map(col)
    val seg = df
      .select(k ++ Seq(
        explode(sequence(expr(s"$stCol div $sliceUs"),
          expr(s"$enCol div $sliceUs"))).as("__slice"),
        col(stCol).as("__s0"), col(enCol).as("__e0")): _*)
      .select(k ++ Seq(
        col("__slice"),
        greatest(col("__s0"), col("__slice") * lit(sliceUs)).as("__st"),
        least(col("__e0"), (col("__slice") + 1) * lit(sliceUs)).as("__en")): _*)
    // running max of PRIOR interval ends: a segment's uncovered part
    // starts where the furthest prior end left off
    val w = Window.partitionBy(k :+ col("__slice"): _*)
      .orderBy(col("__st"), col("__en"))
      .rowsBetween(Window.unboundedPreceding, -1)
    seg
      .withColumn("__pmax", max(col("__en")).over(w))
      .withColumn("__cov", greatest(
        col("__en") - greatest(col("__st"), coalesce(col("__pmax"), col("__st"))),
        lit(0L)))
      .groupBy(k: _*)
      .agg(sum(col("__cov")).as("covered_us"))
  }
}
