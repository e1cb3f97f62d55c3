package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC changeset application — the lakehouse `MERGE INTO` (SCD type 1,
 * latest-wins) kernel: given a `snapshot` table and a `changes` stream of
 * upserts/deletes (each carrying a per-key monotone sequence column),
 * produce the next snapshot where
 *
 *   - the HIGHEST-sequence change per key wins (all older changes ignored),
 *   - a winning delete removes the key,
 *   - a winning upsert replaces the snapshot row wholesale,
 *   - untouched snapshot keys pass through.
 *
 * 100 TB design: one `row_number` window per key over changes (changes are
 * normally ≪ snapshot), then a key-only LEFT ANTI join against the
 * snapshot plus a union — the snapshot is read once, shuffled once on the
 * key (or not at all if both sides are bucketed on it), and AQE's skew
 * split covers hot keys. This is exactly the copy-on-write MERGE shape;
 * `changes` carrying the full row (not a diff) is what keeps the op
 * single-pass.
 */
object Cdc {

  /**
   * @param snapshot  current state, one row per key
   * @param changes   snapshot schema + `seqCol` (per-key unique, monotone)
   *                  + `deleteCol` (boolean; true = tombstone)
   */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
                     seqCol: String, deleteCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val expected = snapshot.columns.toSet ++ Set(seqCol, deleteCol)
    require(changes.columns.toSet == expected,
      s"changes must carry the snapshot schema + $seqCol + $deleteCol; " +
        s"got ${changes.columns.mkString(",")}")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val untouched = snapshot.join(
      latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    untouched.unionByName(
      latest.filter(!coalesce(col(deleteCol), lit(false))).drop(seqCol, deleteCol))
  }

  /**
   * The inverse of [[applyChangeset]]: derive the MINIMAL changeset that
   * turns `oldSnap` into `newSnap` — the lakehouse "table diff" (what a
   * snapshot-compaction audit, an incremental-replication planner, or a
   * backfill validator needs). Each output row is a full new-side row (or
   * the old row for deletes) plus `change_type` ∈ {'I','U','D'}; unchanged
   * keys emit nothing.
   *
   * Round-trip law (spec-pinned): applying the derived changeset to
   * `oldSnap` reproduces `newSnap` exactly.
   *
   * 100 TB design: ONE full outer join keyed on `keyCols` (both sides read
   * once; bucketed layouts co-locate it), update detection compares the
   * non-key payloads as structs — null-safe (`<=>`), so NULL payload
   * fields diff correctly. No window, no second scan.
   */
  /**
   * SCD TYPE 2 changeset application — MERGE with full history tracking,
   * the other classic dimension-maintenance contract next to
   * [[applyChangeset]]'s latest-wins overwrite: every upsert OPENS a new
   * version row valid from its change time and CLOSES the key's previous
   * current version at the same instant; a delete closes without opening.
   * Version validity is the half-open interval `[valid_from, valid_to)`
   * with `valid_to` null (and `is_current` true) for the live row.
   *
   * Mechanics: the base table's CURRENT rows re-enter as opening events
   * at their own `valid_from`, union with the change events, and ONE
   * `lead(ts)` window per key assigns every event its successor's
   * timestamp as `valid_to` — deletes participate in the chain (they
   * close their predecessor) but emit no row. Rows already closed in the
   * base (`valid_to` non-null) pass through untouched. One shuffle on the
   * key, one window, no join — the history rebuild never touches rows
   * outside the changed keys' partitions, and at scale base+changes
   * bucketed on the key makes the shuffle a co-located read.
   *
   * Timestamps are caller-supplied LONGS (epoch-us) so every output cell
   * is exact; `(key, ts)` must be unique (dedupe upstream — latest
   * sequence wins — exactly as [[applyChangeset]] requires).
   *
   * @param base    columns: keyCols ++ payloadCols ++ (valid_from: long,
   *                valid_to: long nullable)
   * @param changes columns: keyCols ++ payloadCols ++ (opCol: 'U' | 'D',
   *                tsCol: long)
   * @return keyCols ++ payloadCols ++ (valid_from, valid_to, is_current)
   */
  def applyChangesetScd2(base: DataFrame, changes: DataFrame,
                         keyCols: Seq[String], payloadCols: Seq[String],
                         tsCol: String, opCol: String): DataFrame = {
    val closed = base.filter(col("valid_to").isNotNull)
      .select((keyCols ++ payloadCols).map(col) :+ col("valid_from") :+
        col("valid_to") :+ lit(false).as("is_current"): _*)
    val openEvents = base.filter(col("valid_to").isNull)
      .select((keyCols ++ payloadCols).map(col) :+
        col("valid_from").as("__ts") :+ lit("U").as("__op"): _*)
    val changeEvents = changes
      .select((keyCols ++ payloadCols).map(col) :+
        col(tsCol).cast("long").as("__ts") :+ col(opCol).as("__op"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__ts"))
    openEvents.unionByName(changeEvents)
      .withColumn("__next", lead(col("__ts"), 1).over(w))
      .filter(col("__op") =!= "D")
      .select((keyCols ++ payloadCols).map(col) :+
        col("__ts").as("valid_from") :+ col("__next").as("valid_to") :+
        col("__next").isNull.as("is_current"): _*)
      .unionByName(closed)
  }

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshots must share a schema; got ${oldSnap.columns.mkString(",")} " +
        s"vs ${newSnap.columns.mkString(",")}")
    val payload = oldSnap.columns.filterNot(keyCols.contains).toSeq
    val o = oldSnap.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("__po"): _*)
    val n = newSnap.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("__pn"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__po").isNull, lit("I"))
          .when(col("__pn").isNull, lit("D"))
          .when(!(col("__po") <=> col("__pn")), lit("U")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) ++ payload.indices.map(i =>
        // deletes carry the old payload (the row being removed); inserts
        // and updates carry the new one
        when(col("change_type") === "D", col("__po").getField(payload(i)))
          .otherwise(col("__pn").getField(payload(i))).as(payload(i))) :+
        col("change_type"): _*)
  }
}
