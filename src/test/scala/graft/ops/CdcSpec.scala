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

  test("applyChangeset rejects schema drift in changes") {
    val snapshot = Seq((1L, 1)).toDF("k", "v")
    val bad = Seq((1L, 1, 2L)).toDF("k", "v", "seq") // missing delete col
    assertThrows[IllegalArgumentException] {
      Cdc.applyChangeset(snapshot, bad, Seq("k"), "seq", "del")
    }
  }
}
