package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpec {

  import spark.implicits._

  private val base = Seq(
    ("a", 1L, 10L), ("a", 1L, 20L), ("a", 2L, 5L),
    ("b", 1L, 7L), ("b", 1L, 3L)
  ).toDF("k", "sub", "x")

  test("materialize: count + sum per key") {
    val v = Ivm.materialize(base, Seq("k"), Seq("x"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("a", 3L, 35L), ("b", 2L, 10L)))
  }

  test("refresh equals re-materialization: inserts, deletes, new group, group drop") {
    val view = Ivm.materialize(base, Seq("k"), Seq("x"))
    val delta = Seq(
      ("a", 1L, 10L, -1L),  // delete an existing row
      ("a", 9L, 100L, 1L),  // insert into existing group
      ("c", 1L, 42L, 1L),   // insert creating a new group
      ("b", 1L, 7L, -1L),   // delete...
      ("b", 1L, 3L, -1L)    // ...every b row: group must DROP
    ).toDF("k", "sub", "x", "m")
    val got = Ivm.refresh(view, delta, Seq("k"), Seq("x"), "m")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    // full recompute over the changed base
    val changed = Seq(
      ("a", 1L, 20L), ("a", 2L, 5L), ("a", 9L, 100L), ("c", 1L, 42L)
    ).toDF("k", "sub", "x")
    val want = Ivm.materialize(changed, Seq("k"), Seq("x"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    assert(!got.exists(_._1 == "b"))
  }

  test("refresh is associative: two small deltas == one combined delta") {
    val view = Ivm.materialize(base, Seq("k"), Seq("x"))
    val d1 = Seq(("a", 1L, 10L, -1L), ("c", 1L, 42L, 1L)).toDF("k", "sub", "x", "m")
    val d2 = Seq(("c", 2L, 8L, 1L), ("a", 2L, 5L, -1L)).toDF("k", "sub", "x", "m")
    val stepwise = Ivm.refresh(
      Ivm.refresh(view, d1, Seq("k"), Seq("x"), "m"),
      d2, Seq("k"), Seq("x"), "m")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val combined = Ivm.refresh(view, d1.unionByName(d2), Seq("k"), Seq("x"), "m")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(stepwise == combined)
  }

  test("multFromDeleteFlag and view-schema validation") {
    val m = Seq((true), (false)).toDF("del")
      .select(Ivm.multFromDeleteFlag(col("del")).as("m"))
      .as[Long].collect().toSeq
    assert(m == Seq(-1L, 1L))
    val badView = base.limit(1) // not a materialized view shape
    assertThrows[IllegalArgumentException] {
      Ivm.refresh(badView, base.withColumn("m", lit(1L)),
        Seq("k"), Seq("x"), "m")
    }
  }
}
