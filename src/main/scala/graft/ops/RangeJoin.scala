package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Binned range join: join interval rows `[lo, hi]` to point rows on a shared
 * equi-key PLUS a time/range containment predicate, executed as a shuffle
 * equi-join on (key, bin) instead of a sort-merge join with a residual
 * range filter.
 *
 * Why it matters at 100 TB: Catalyst plans `a.key = b.key AND b.t BETWEEN
 * a.lo AND a.hi` as an equi-join on `key` with the range as a post-join
 * filter — the per-key candidate set is the full cross product of that key's
 * rows, so one hot key (a bot user, a boilerplate document) explodes
 * quadratically. Binning by `floor(t / binWidth)` adds the bin to the join
 * key: each interval is replicated to the ~(span/binWidth + 1) bins it
 * covers, each point lands in exactly one bin, and the candidate set shrinks
 * to pairs that are already within `binWidth` of matching. Work is
 * output-bound, hot keys are split across bins, and the shuffle key
 * cardinality grows with the data. (Same cover-cell idea as
 * [[SpatialJoin.quadkeyRefineJoin]], in one dimension; a point is covered by
 * exactly one cell, so no post-join dedup is needed.)
 *
 * All bin arithmetic is integer (`div`) on long values (e.g. `unix_micros`)
 * — exact, no float boundary risk. Choose `binWidth` ≈ the typical interval
 * span: much smaller multiplies the replication factor, much larger
 * re-grows the candidate sets.
 *
 * Contract: interval and point frames must not share column names other than
 * the join keys (pre-select/rename — the query layer does).
 */
object RangeJoin {

  /** Inner-join intervals to the points they contain: one output row per
    * (interval, point) pair with `keyCols` equal and `lo <= t <= hi`
    * (pass `lo = t0 + 1` for an open lower bound — integer micros). */
  def binnedIntervalJoin(intervals: DataFrame, lo: String, hi: String,
                         points: DataFrame, t: String,
                         keyCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$lo div $binWidth"), expr(s"$hi div $binWidth"))))
    val pt = points.withColumn("__bin", expr(s"$t div $binWidth"))
    iv.join(pt, (keyCols :+ "__bin"))
      .filter(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__bin")
  }
}
