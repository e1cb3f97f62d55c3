package graft.util

import org.apache.spark.sql.{DataFrame, Row}

/**
 * Guarded driver-side collects. The engine's broadcast operators collect a
 * dimension side that is small BY CONSTRUCTION (≤ 408 storm envelopes, a
 * country's admin polygons); these helpers turn a miswired call — somebody
 * passing the 100 TB fact side — into an immediate, named error instead of
 * a driver OOM minutes later.
 */
object Collects {

  /** Default cap for broadcastable dimension sides: far above any legitimate
    * storm-pipeline dimension (408 envelopes, ≤ thousands of admin rows) and
    * far below anything that endangers the driver. */
  val DefaultMaxBroadcastRows: Int = 100000

  /**
   * Collect at most `max` rows; fail loud if the plan yields more. The
   * `limit(max + 1)` bounds what ever reaches the driver, so even the
   * failure path cannot OOM.
   */
  def boundedCollect(df: DataFrame, what: String, alternative: String,
                     max: Int = DefaultMaxBroadcastRows): Array[Row] = {
    val rows = df.limit(max + 1).collect()
    require(rows.length <= max,
      s"$what produced more than $max rows — this side is not broadcastable. " +
        s"For two large sides use $alternative.")
    rows
  }
}
