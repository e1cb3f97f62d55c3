package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit (the Deequ/Great-Expectations pattern —
 * Schelter et al., "Automating Large-Scale Data Quality Verification",
 * VLDB'18): a suite of constraints evaluated over a table in ONE
 * aggregation pass, emitting a per-constraint report
 * `(check_name, n_rows, n_violations, passed)`.
 *
 * 100 TB design: every row-level check folds into the same global
 * aggregate (map-side partial sums — one narrow pass over the scan, no
 * per-check jobs); uniqueness checks add `count_distinct`s to the same
 * aggregate (Catalyst plans multi-distinct via Expand — each distinct key
 * multiplies the aggregation input, so at extreme scale prefer
 * `approxUnique = true`, which swaps in HLL `approx_count_distinct`, one
 * sketch per check, no Expand). The result is O(#checks) rows — a
 * broadcastable gate for downstream jobs.
 */
object Audit {

  /** A row-level expectation: `predicate` must be TRUE for the row to
    * pass; NULL counts as a violation (fail-loud on missing data). */
  case class RowCheck(name: String, predicate: Column)

  /** A uniqueness expectation on a key column: violations = surplus rows
    * beyond one per distinct key (0 ⇔ the column is a key). */
  case class UniqueCheck(name: String, keyCol: String)

  def audit(df: DataFrame, rowChecks: Seq[RowCheck],
            uniqueChecks: Seq[UniqueCheck] = Nil,
            approxUnique: Boolean = false): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty, "no checks given")
    val nDistinct = (k: String) =>
      if (approxUnique) approx_count_distinct(col(k)) else count_distinct(col(k))
    val aggs =
      count(lit(1)).as("__n") +:
        (rowChecks.map(c =>
          sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L))
            .as(s"__v_${c.name}")) ++
          uniqueChecks.map(u => nDistinct(u.keyCol).as(s"__d_${u.name}")))
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val reports =
      rowChecks.map(c => struct(lit(c.name).as("check_name"),
        coalesce(col(s"__v_${c.name}"), lit(0L)).as("n_violations"))) ++
        uniqueChecks.map(u => struct(lit(u.name).as("check_name"),
          (col("__n") - col(s"__d_${u.name}")).as("n_violations")))
    agged.select(col("__n").as("n_rows"), explode(array(reports: _*)).as("r"))
      .select(col("r.check_name").as("check_name"), col("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
  }
}
