package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  import spark.implicits._

  test("applyChangeset: latest wins, deletes remove, untouched pass through") {
    val snapshot = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "b2", 21, 100L, false),  // older upsert for k=2
      (2L, "b3", 22, 200L, false),  // latest upsert for k=2 wins
      (3L, "c", 0, 150L, true),     // delete k=3
      (4L, "d", 40, 120L, false)    // insert new key
    ).toDF("k", "name", "v", "seq", "del")
    val got = Cdc.applyChangeset(snapshot, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "a", 10), (2L, "b3", 22), (4L, "d", 40)))
  }

  test("applyChangeset: delete then re-insert resolves by sequence; null delete flag = upsert") {
    val snapshot = Seq((1L, "x", 1)).toDF("k", "name", "v")
    val changes = Seq(
      (1L, "x", 0, 10L, Some(true)),        // delete at seq 10
      (1L, "x9", 9, 20L, None: Option[Boolean]) // later upsert, null flag
    ).toDF("k", "name", "v", "seq", "del")
    val got = Cdc.applyChangeset(snapshot, changes, Seq("k"), "seq", "del")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "x9", 9)))
  }

  test("snapshotDiff: minimal I/U/D set, null-safe payload compare") {
    val old = Seq((1L, Some("a"), 10), (2L, Some("b"), 20), (3L, None, 30),
      (4L, Some("d"), 40)).toDF("k", "name", "v")
    val nw = Seq((1L, Some("a"), 10),       // unchanged → no row
      (2L, Some("b2"), 20),                  // updated
      (3L, None, 30),                        // unchanged incl. null payload
      (5L, Some("e"), 50)).toDF("k", "name", "v") // insert; k=4 deleted
    val got = Cdc.snapshotDiff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, Option[String], Int, String)].collect().toSeq
    assert(got == Seq((2L, Some("b2"), 20, "U"), (4L, Some("d"), 40, "D"),
      (5L, Some("e"), 50, "I")))
  }

  test("round trip: applyChangeset(old, snapshotDiff(old, new)) == new") {
    val rnd = new scala.util.Random(3)
    val old = (1L to 500L).map(k => (k, s"n$k", rnd.nextInt(100))).toDF("k", "name", "v")
    val nw = (1L to 600L).filter(_ % 7 != 0)
      .map(k => (k, s"n$k", if (k % 3 == 0) 999 else (k % 100).toInt))
      .toDF("k", "name", "v")
    val diff = Cdc.snapshotDiff(old, nw, Seq("k"))
      .withColumn("seq", lit(1L))
      .withColumn("del", col("change_type") === "D")
      .drop("change_type")
    val applied = Cdc.applyChangeset(old, diff, Seq("k"), "seq", "del")
      .as[(Long, String, Int)].collect().toSet
    val expect = nw.as[(Long, String, Int)].collect().toSet
    assert(applied == expect)
  }

  test("applyChangesetScd2: versions chain, deletes close, closed history passes through") {
    // base: key 1 current since t=0; key 2 current since t=0 with an old
    // closed version [(-10, 0)]; key 3 untouched current
    val base = Seq(
      (1L, 100L, 0L, Option.empty[Long]),
      (2L, 200L, 0L, Option.empty[Long]),
      (2L, 190L, -10L, Some(0L)),
      (3L, 300L, 0L, Option.empty[Long])
    ).toDF("k", "v", "valid_from", "valid_to")
    // key 1: update at 5, update at 9; key 2: delete at 7
    val changes = Seq(
      (1L, 110L, "U", 5L), (1L, 120L, "U", 9L), (2L, 0L, "D", 7L)
    ).toDF("k", "v", "op", "ts")
    val out = Cdc.applyChangesetScd2(base, changes, Seq("k"), Seq("v"), "ts", "op")
      .orderBy("k", "valid_from")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 100L, 0L, Some(5L), false),   // closed by the t=5 update
      (1L, 110L, 5L, Some(9L), false),   // closed by the t=9 update
      (1L, 120L, 9L, None, true),        // live
      (2L, 190L, -10L, Some(0L), false), // pre-closed history untouched
      (2L, 200L, 0L, Some(7L), false),   // closed by the delete, no successor
      (3L, 300L, 0L, None, true)))       // untouched key stays current
  }

  test("applyChangeset rejects schema drift in changes") {
    val snapshot = Seq((1L, 1)).toDF("k", "v")
    val bad = Seq((1L, 1, 2L)).toDF("k", "v", "seq") // missing delete col
    assertThrows[IllegalArgumentException] {
      Cdc.applyChangeset(snapshot, bad, Seq("k"), "seq", "del")
    }
  }
}
