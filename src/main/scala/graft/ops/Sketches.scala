package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketches (Apache DataSketches HLL, native in
 * Spark since 3.5): the 100 TB pattern for COUNT(DISTINCT) — an exact
 * distinct over a huge key domain shuffles every key once per query, while
 * an HLL sketch is a few KB per group, pre-aggregable per partition
 * (map-side combine), storable as a column, and UNIONABLE: yesterday's
 * per-day sketches merge into weekly/monthly distincts with no re-scan of
 * the raw data. Estimates carry ~1-2% relative error at lgK=12 — the right
 * trade for dashboard-class cardinalities (use exact `countDistinct` only
 * where the group domain is small).
 *
 * All four helpers are thin aliases over codegen'd built-ins; they exist to
 * name the pattern and fix a default precision.
 */
object Sketches {

  /** Aggregate a column into an HLL sketch (binary, mergeable). */
  def hllSketch(c: Column, lgK: Int = 12): Column = hll_sketch_agg(c, lit(lgK))

  /** Merge previously built sketches (e.g. daily → monthly). */
  def hllMerge(sketch: Column): Column = hll_union_agg(sketch, lit(false))

  /** Point estimate of a sketch's distinct count. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Per-group distinct estimates in one pass: `groupBy(keys).agg(estimate)`.
    * Equivalent to exact `countDistinct` up to sketch error, at a fraction
    * of the shuffle (one sketch per (partition, group), not one row per
    * distinct value). */
  def approxDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     outCol: String = "approx_distinct", lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hllEstimate(hllSketch(col(valueCol), lgK)).as(outCol))

  /**
   * The two-level rollup that makes sketches worth storing: build per-fine-
   * group sketches once (e.g. per day), then merge them to coarse groups
   * (e.g. per month) WITHOUT touching the raw data again. Returns the
   * coarse-group frame with `outCol` estimates.
   */
  def mergedDistinct(df: DataFrame, fineCols: Seq[String], coarseCols: Seq[String],
                     valueCol: String, outCol: String = "approx_distinct",
                     lgK: Int = 12): DataFrame = {
    val fine = df.groupBy((fineCols ++ coarseCols).distinct.map(col): _*)
      .agg(hllSketch(col(valueCol), lgK).as("__sketch"))
    fine.groupBy(coarseCols.map(col): _*)
      .agg(hllEstimate(hllMerge(col("__sketch"))).as(outCol))
  }
}
