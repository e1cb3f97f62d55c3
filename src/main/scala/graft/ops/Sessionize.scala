package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization (gaps-and-islands): assign a per-key session ordinal
 * to every event, where a new session starts when the gap to the previous
 * event exceeds `gapMicros`. The classic event-stream primitive the reference
 * approximates with its 6-hourly forecast grouping (each forecast cycle is a
 * "session" of track points; snowflake_utils.py groups by forecast time), and
 * a first-class operator for clickstream/training-telemetry pipelines.
 *
 * Scale design: ONE shuffle on the session keys (the window partition); the
 * lag + running-sum pass is a single sort-based window — no self-join, no
 * explode. Keys are independent, so 1000 executors each sessionize their key
 * range; a hot key degrades to one sorted partition, which is inherent to
 * per-key ordering (salt upstream if a single key exceeds a partition).
 *
 * Gap comparison is integer microseconds (`unix_micros`) — exact, no float
 * boundary ambiguity. An event exactly `gapMicros` after its predecessor
 * still belongs to the same session (strictly-greater starts a new one).
 */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session ordinal). Ties on `tsCol`
    * are broken by `tieBreak` so the ordering — and thus the session split —
    * is deterministic. */
  def withSessionSeq(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     gapMicros: Long, tieBreak: Seq[Column] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieBreak).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull || unix_micros(col(tsCol)) - prev > gapMicros, 1).otherwise(0)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: start/end timestamps, event count, value total.
    * Two window passes + one aggregation, all partitioned by the same keys —
    * a single shuffle end to end (the exchange is reused across the window
    * and the groupBy because the keys are a prefix of the grouping). */
  def sessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
               gapMicros: Long, valueCol: Option[String] = None,
               tieBreak: Seq[Column] = Nil): DataFrame = {
    val seq = withSessionSeq(df, keyCols, tsCol, gapMicros, tieBreak)
    val aggs =
      Seq(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events")) ++
      valueCol.map(v => sum(col(v)).as("total_value"))
    seq.groupBy((keyCols :+ "session_seq").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
