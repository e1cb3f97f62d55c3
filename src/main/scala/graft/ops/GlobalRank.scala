package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe global ordering primitives — the replacement for the
 * single-task `Window.orderBy(...)` global sort, which serializes the
 * ENTIRE table through one task (a non-starter when the table is a
 * web-scale vocabulary of 10⁸–10⁹ distinct tokens or a 10⁹-row document
 * table).
 *
 * The pattern (first proven in [[graft.llm.Dedup.sortedNeighborhoodPairs]]):
 *   1. `repartitionByRange` on the order columns — range partitions are
 *      globally ordered, so every row of partition i precedes every row of
 *      partition i+1;
 *   2. `localCheckpoint` to FREEZE the (boundary-sampled) partitioning —
 *      the offset table is computed against these exact partitions, and
 *      downstream consumers must not re-run the sampling;
 *   3. a P-row per-partition count → exclusive prefix sum via a window
 *      over the TINY partition-id table (P rows, not N) → broadcast;
 *   4. global rank = partition offset + in-partition `row_number`
 *      (or offset + in-partition running sum, for prefix sums).
 *
 * The result is exactly the value the global window would produce —
 * independent of where the sampled boundaries fall — because the order
 * columns form a strict total order across rows (callers must guarantee
 * uniqueness of the order key; ties would make both the global window and
 * this pattern nondeterministic). Work is two narrow passes plus one range
 * shuffle, with no task ever holding more than one partition's rows.
 */
object GlobalRank {

  /**
   * Adds `outCol` = 1-based global rank of each row under `orderCols`
   * (LongType). `orderCols` must be unique per row (strict total order).
   * Only the intermediate range-partitioned frame is localCheckpoint'ed
   * (freezing the partitioning, so ranks are CORRECT for every consumer);
   * the offset join and per-partition window on top re-execute per
   * consumer. Callers fanning the result out to several actions should
   * checkpoint it themselves to avoid paying the window repeatedly (as
   * `Dedup.sortedNeighborhoodPairs` does).
   */
  def withGlobalRank(df: DataFrame, outCol: String, orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "withGlobalRank needs at least one order column")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, orderCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint()
    ranged.join(broadcast(partitionOffsets(ranged, lit(1L))), "__gr_pid")
      .withColumn(outCol,
        row_number().over(
          Window.partitionBy("__gr_pid").orderBy(orderCols: _*)).cast("long") +
          col("__gr_off"))
      .drop("__gr_pid", "__gr_off")
  }

  /**
   * Adds `outCol` = EXCLUSIVE global prefix sum of `valueCol` under
   * `orderCols` (LongType; the first row gets 0) — the distributed
   * equivalent of `sum(valueCol).over(Window.orderBy(orderCols)
   * .rowsBetween(unboundedPreceding, -1))`. Same total-order requirement
   * and checkpoint contract as [[withGlobalRank]].
   */
  def withGlobalPrefixSum(df: DataFrame, valueCol: Column, outCol: String,
                          orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "withGlobalPrefixSum needs at least one order column")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, orderCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .withColumn("__gr_v", valueCol.cast("long"))
      .localCheckpoint()
    ranged.join(broadcast(partitionOffsets(ranged, col("__gr_v"))), "__gr_pid")
      .withColumn(outCol,
        coalesce(sum(col("__gr_v")).over(
          Window.partitionBy("__gr_pid").orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
          col("__gr_off"))
      .drop("__gr_pid", "__gr_v", "__gr_off")
  }

  /**
   * Adds `outCol` = the distributed equivalent of
   * `ntile(buckets).over(Window.orderBy(orderCols))` (IntegerType), exactly
   * reproducing Spark's ntile semantics: with N rows, the first N % buckets
   * buckets hold ⌈N/buckets⌉ rows, the rest ⌊N/buckets⌋ — a pure function
   * of the global rank, so the single-task global sort ntile plans is
   * replaced by [[withGlobalRank]]'s range partitions + one scalar count.
   * Same total-order requirement as [[withGlobalRank]]. The result is
   * localCheckpoint'ed (the scalar N read already forced the rank pass;
   * checkpointing hands consumers the paid-for rows).
   */
  def withGlobalNtile(df: DataFrame, outCol: String, buckets: Int,
                      orderCols: Column*): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    val ranked = withGlobalRank(df, "__gr_r", orderCols: _*).localCheckpoint()
    val n = ranked.count()
    if (n == 0) return ranked.withColumn(outCol, lit(1)).drop("__gr_r")
    val q = n / buckets
    val r0 = n % buckets
    val big = q + 1 // rows per bucket in the first r0 buckets
    val bucket =
      if (q == 0) col("__gr_r") // more buckets than rows: bucket = rank
      else when(col("__gr_r") <= lit(r0 * big),
          (col("__gr_r") - 1) / lit(big) + 1)
        .otherwise(lit(r0) + (col("__gr_r") - 1 - lit(r0 * big)) / lit(q) + 1)
    ranked.withColumn(outCol, bucket.cast("int")).drop("__gr_r")
  }

  /** P-row exclusive-offset table: sum of `per` over all EARLIER range
    * partitions. The window here orders P partition ids, not N rows. */
  private def partitionOffsets(ranged: DataFrame, per: Column): DataFrame =
    ranged.groupBy("__gr_pid").agg(sum(per).as("__gr_cnt"))
      .select(col("__gr_pid"),
        (coalesce(sum(col("__gr_cnt")).over(Window.orderBy("__gr_pid")), lit(0L)) -
          col("__gr_cnt")).as("__gr_off"))
}
