package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Count-Min frequency sketch over a column (binary, mergeable — the
    * native `count_min_sketch` aggregate pre-aggregates per partition, so
    * the whole stream reduces to one `O(1/eps · ln 1/confidence)` table). */
  def cmsSketch(c: Column, eps: Double = 0.001, confidence: Double = 0.99,
                seed: Int = 42): Column =
    count_min_sketch(c, lit(eps), lit(confidence), lit(seed))

  /** Point-estimate items against a serialized Count-Min sketch (the
    * `count_min_sketch` aggregate's binary payload). Driver-side by design:
    * the sketch is a few hundred KB however big the data was, and the items
    * queried are a bounded top-k list. Guarantees (per sketch): estimate ≥
    * true count; estimate ≤ true count + eps·N with prob ≥ confidence. */
  def cmsEstimate(sketchBytes: Array[Byte], items: Seq[Any]): Seq[Long] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    items.map(cms.estimateCount)
  }

  /**
   * Heavy hitters with an error-bound audit — the 100 TB pattern for "top
   * tokens over a corpus you can't exactly count per key": ONE pass builds
   * a mergeable CMS; the exact top-k (for the audit / final ranking) comes
   * from the usual map-side-combined count. Returns the exact top-k rows
   * `(item, n, cms_ok)` where `cms_ok` pins the sketch's guarantee
   * (over-estimate only, within eps·N) — a broken sketch fails loud.
   */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, k: Int = 20,
                      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol)
    // one distributed job computes both aggregates over the same scan
    val exact = df.groupBy(v.as("item")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item")).limit(k)
    val Row(sketchBytes: Array[Byte], total: Long) =
      df.agg(cmsSketch(v, eps, confidence), count(lit(1))).head()
    val top = exact.collect().toSeq // bounded: k rows
    val ests = cmsEstimate(sketchBytes, top.map(_.get(0)))
    val slack = math.ceil(eps * total).toLong
    top.zip(ests).map { case (r, est) =>
      val n = r.getLong(1)
      (r.getString(0), n, est >= n && est <= n + slack)
    }.toDF("item", "n", "cms_ok")
  }
}
