package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental view maintenance (IVM) for distributive aggregates: keep a
 * materialized per-key aggregate (COUNT + SUMs; AVG and other ratios are
 * quotients of maintained sums, never maintained directly) in sync with a
 * changing base table by applying a CHANGE SET, without rescanning the base.
 *
 * The view's rows ARE partial aggregates, so refresh is the classic
 * delta-partials merge: aggregate the delta per key with each row weighted
 * by a multiplicity column (+1 insert, −1 delete; an update is a
 * delete+insert pair), union with the current view, and re-aggregate.
 * Groups whose refreshed count reaches 0 drop out of the view.
 *
 * 100 TB design: the base table is NEVER read — refresh cost is
 * O(|delta| + |view|), with the delta aggregation map-side combinable and
 * both union legs shuffling on the same group keys (co-partitioned when the
 * view is persisted bucketed by key, making the merge shuffle view-side
 * free). This is the shape that turns a nightly full recompute over 100 TB
 * into a per-batch merge over megabytes, and it composes directly with the
 * CDC changelog ops ([[Cdc.applyChangeset]] / streaming
 * `latestChangePerKey`) that produce the multiplicity-weighted delta.
 *
 * Correctness precondition (enforced by the caller, checked by the q51
 * oracle's full recompute): delete rows must correspond to rows actually
 * present in the base — IVM maintains the aggregate of a multiset, it
 * cannot validate membership without the base.
 */
object Ivm {

  private def sumAlias(c: String) = s"sum_$c"

  /** Build the initial materialized view over `base`: `n_rows` (COUNT) plus
    * `sum_<c>` for each `sumCols` column. One map-side-combinable hash
    * aggregate keyed on `keys`. */
  def materialize(base: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(sumAlias(c)))
    base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Apply a multiplicity-weighted delta to a materialized view.
   *
   * @param view    output of [[materialize]] (or a previous [[refresh]])
   * @param delta   base-table schema rows + `multCol` (+1 insert, −1 delete)
   * @param multCol integer multiplicity column in `delta`
   * @return        the refreshed view — identical (up to row order) to
   *                re-materializing over the changed base
   */
  def refresh(view: DataFrame, delta: DataFrame, keys: Seq[String],
              sumCols: Seq[String], multCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val expectedCols = (keys ++ Seq("n_rows") ++ sumCols.map(sumAlias)).toSet
    require(view.columns.toSet == expectedCols,
      s"view must carry ${expectedCols.mkString(",")}; got ${view.columns.mkString(",")}")
    val m = col(multCol)
    val deltaAggs = sum(m).cast("long").as("n_rows") +:
      sumCols.map(c => sum(col(c) * m).as(sumAlias(c)))
    val deltaPart = delta.groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val mergeAggs = sum(col("n_rows")).cast("long").as("n_rows") +:
      sumCols.map(c => sum(col(sumAlias(c))).as(sumAlias(c)))
    view.unionByName(deltaPart)
      .groupBy(keys.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
      .filter(col("n_rows") > 0)
  }

  /** Multiplicity column helper: +1 / −1 from a boolean delete flag. */
  def multFromDeleteFlag(isDelete: Column): Column =
    when(isDelete, lit(-1L)).otherwise(lit(1L))
}
