package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling helpers (SURVEY.md §4 "salting for skew"). At 100 TB a
 * handful of hot keys (a mega-city admin region, a boilerplate dedup
 * bucket) can stall a stage on one reducer; salting fans a hot key across
 * `salts` reducers with a two-phase aggregate, trading one extra (tiny)
 * shuffle for even task sizes. AQE's skew-join splitting covers joins;
 * this covers aggregations, which AQE does not rebalance.
 */
object Skew {

  /**
   * Two-phase salted aggregation: groupBy (keys + salt) with partial
   * aggregates, then collapse the salt. Correct for distributive aggregates
   * (sum/count/min/max). `aggs` maps output column name -> (phase1 agg of
   * the input column, phase2 collapse of the phase-1 column).
   */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, a, _) => a.as(s"__p_$n") }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _, c) => c(col(s"__p_$n")).as(n) }: _*)
  }

  /** Convenience: salted sum + count for one value column. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts, Seq(
      ("sum_" + valueCol, sum(col(valueCol)), (c: Column) => sum(c)),
      ("count", count(lit(1)), (c: Column) => sum(c))))
}
