package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditSpec extends SparkSpec {

  import spark.implicits._
  import Audit.{RowCheck, UniqueCheck}

  private val df = Seq(
    (1L, Some(10.0), "O"),
    (2L, Some(-5.0), "F"),     // price violation
    (3L, None, "O"),           // null price -> violation (null = fail)
    (3L, Some(7.0), "X"),      // dup key + bad status
    (5L, Some(1.0), "P")
  ).toDF("k", "price", "status")

  test("audit: one row per check, violation counts, null predicate fails") {
    val got = Audit.audit(df,
      rowChecks = Seq(
        RowCheck("price_positive", col("price") > 0),
        RowCheck("status_domain", col("status").isin("O", "F", "P")),
        RowCheck("key_not_null", col("k").isNotNull)),
      uniqueChecks = Seq(UniqueCheck("key_unique", "k")))
      .orderBy("check_name")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("key_not_null", 5L, 0L, true),
      ("key_unique", 5L, 1L, false),      // one surplus row for k=3
      ("price_positive", 5L, 2L, false),  // -5 and null
      ("status_domain", 5L, 1L, false)))
  }

  test("audit: empty table passes row checks with zero counts") {
    val got = Audit.audit(df.filter(lit(false)),
      rowChecks = Seq(RowCheck("price_positive", col("price") > 0)),
      uniqueChecks = Seq(UniqueCheck("key_unique", "k")))
      .orderBy("check_name")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("key_unique", 0L, 0L, true), ("price_positive", 0L, 0L, true)))
  }

  test("audit: approxUnique swaps in HLL and stays exact on small domains") {
    val got = Audit.audit(df, rowChecks = Nil,
      uniqueChecks = Seq(UniqueCheck("key_unique", "k")), approxUnique = true)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("key_unique", 5L, 1L, false)))
  }
}
