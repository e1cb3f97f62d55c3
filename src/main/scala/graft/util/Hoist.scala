package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level common-subexpression hoisting for lambda bodies.
  *
  * Higher-order functions (`transform`, `aggregate`, `filter`) evaluate
  * their lambdas INTERPRETED, once per element — any non-trivial
  * expression referenced inside the lambda (a regex split, an md5, a
  * whole upstream projection) re-runs per element. Measured: d64's bigram
  * build inlined `tokens(text)` into its transform and paid ~2 regex
  * splits of the full document PER BIGRAM (5+ s of a 5.3 s query).
  *
  * When the consumer is a DataFrame, the fix is a projection that
  * materializes the expression as an attribute first. When the expression
  * must stay a single `Column` (inside a reusable Column function),
  * [[once]] wraps it in a 1-element array and binds it as the lambda
  * variable of an outer `transform` — array construction and the lambda
  * input position both evaluate exactly once, and every reference inside
  * `f` is a cheap bound-variable read.
  */
object Hoist {
  /** `f` over `e`, with `e` evaluated exactly once per row. */
  def once(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)
}
