package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Sessionize / asofJoin / binned range join vs brute-force oracles. */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000).toInstant
    .plusNanos((us % 1000) * 1000)

  // (user, t_us, id, value) — crafted gaps incl. the exact-gap boundary
  private val events = Seq(
    (1L, 0L, 1L, 1.0), (1L, 100L, 2L, 2.0), (1L, 300L, 3L, 4.0),
    (1L, 301L, 4L, 8.0), // 1 us after → same session (gap 200)
    (1L, 502L, 5L, 16.0), // 201 us after 301 → NEW session
    (1L, 702L, 6L, 32.0), // exactly gap=200 after → SAME session (inclusive)
    (2L, 0L, 7L, 1.0), (2L, 1000L, 8L, 2.0),
    (3L, 5L, 9L, 3.0))

  private def eventsDf = events
    .toDF("user_id", "t_us", "event_id", "value")
    .withColumn("ts", timestamp_micros(col("t_us")))

  test("sessionize: gap splits, inclusive boundary, per-session rollup") {
    val out = Sessionize.sessions(eventsDf, Seq("user_id"), "ts", gapMicros = 200L,
        valueCol = Some("value"), tieBreak = Seq(col("event_id")))
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"), col("total_value"))
      .orderBy("user_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 301L, 4L, 15.0),   // 0,100,300,301 chain (each step <= 200)
      (1L, 502L, 702L, 2L, 48.0), // 502 starts new; 702 exactly 200 later joins
      (2L, 0L, 0L, 1L, 1.0), (2L, 1000L, 1000L, 1L, 2.0),
      (3L, 5L, 5L, 1L, 3.0)))
  }

  test("asofJoin matches brute force; inclusive ties; payload row-consistent") {
    val left = eventsDf.select(col("user_id"), col("event_id"), col("ts"))
    val right = Seq(
      (1L, 0L, 100L, "a"), (1L, 300L, 101L, "b"), (1L, 300L, 102L, "c"), // tie at 300
      (1L, 600L, 103L, "d"), (2L, 999L, 104L, "e"), (4L, 0L, 105L, "x"))
      .toDF("user_id", "t_us", "rid", "tag")
      .withColumn("rts", timestamp_micros(col("t_us"))).drop("t_us")
    val got = Deltas.asofJoin(left, right, Seq("user_id"),
        leftTime = "ts", rightTime = "rts", payload = Seq("rid", "tag"),
        tieBreak = Some("rid"))
      .select("event_id", "asof_rid", "asof_tag")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.getString(2))))).toMap
    // brute force: max rts <= ts, tie -> max rid; payload fields from SAME row
    val rrows = Seq((1L, 0L, 100L, "a"), (1L, 300L, 101L, "b"), (1L, 300L, 102L, "c"),
      (1L, 600L, 103L, "d"), (2L, 999L, 104L, "e"), (4L, 0L, 105L, "x"))
    for ((u, t, id, _) <- events) {
      val cands = rrows.filter(r => r._1 == u && r._2 <= t)
      val want = if (cands.isEmpty) (None, None) else {
        val best = cands.maxBy(r => (r._2, r._3))
        (Some(best._3), Some(best._4))
      }
      assert(got(id) == (want._1, want._2), s"event $id (user $u, t $t)")
    }
    // the user-1 event at 300 must see the rid-102 row ("c"), not a mix
    val e3 = got(3L)
    assert(e3 == (Some(102L), Some("c")))
  }

  test("asofJoin forward matches brute force; inclusive ties take greatest tieBreak") {
    val left = eventsDf.select(col("user_id"), col("event_id"), col("ts"))
    val rrows = Seq((1L, 0L, 100L, "a"), (1L, 300L, 101L, "b"), (1L, 300L, 102L, "c"),
      (1L, 600L, 103L, "d"), (2L, 999L, 104L, "e"), (4L, 0L, 105L, "x"))
    val right = rrows.toDF("user_id", "t_us", "rid", "tag")
      .withColumn("rts", timestamp_micros(col("t_us"))).drop("t_us")
    val got = Deltas.asofJoin(left, right, Seq("user_id"),
        leftTime = "ts", rightTime = "rts", payload = Seq("rid", "tag"),
        tieBreak = Some("rid"), direction = "forward")
      .select("event_id", "asof_rid", "asof_tag")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.getString(2))))).toMap
    // brute force: min rts >= ts, tie -> max rid; payload fields from SAME row
    for ((u, t, id, _) <- events) {
      val cands = rrows.filter(r => r._1 == u && r._2 >= t)
      val want = if (cands.isEmpty) (None, None) else {
        val best = cands.minBy(_._2)
        val tied = cands.filter(_._2 == best._2).maxBy(_._3)
        (Some(tied._3), Some(tied._4))
      }
      assert(got(id) == (want._1, want._2), s"event $id (user $u, t $t)")
    }
  }

  test("asofJoin rejects an unknown direction") {
    intercept[IllegalArgumentException] {
      Deltas.asofJoin(eventsDf, eventsDf, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id"), direction = "nearest")
    }
  }

  test("binned range join = brute-force inequality join, across bin boundaries") {
    val iv = eventsDf.select(col("user_id"), col("event_id").as("iv_id"),
      (col("t_us") + 1).as("lo"), (col("t_us") + 250).as("hi"))
    val pts = eventsDf.select(col("user_id"), col("event_id").as("pt_id"),
      col("t_us").as("t"))
    val got = RangeJoin.binnedIntervalJoin(iv, "lo", "hi", pts, "t",
        Seq("user_id"), binWidth = 100L)
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (u1, t1, id1, _) <- events
      (u2, t2, id2, _) <- events
      if u1 == u2 && t2 >= t1 + 1 && t2 <= t1 + 250
    } yield (id1, id2)).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("binned range join emits each qualifying pair exactly once") {
    val iv = eventsDf.select(col("user_id"), col("event_id").as("iv_id"),
      col("t_us").as("lo"), (col("t_us") + 1000).as("hi")) // spans many bins
    val pts = eventsDf.select(col("user_id"), col("event_id").as("pt_id"),
      col("t_us").as("t"))
    val rows = RangeJoin.binnedIntervalJoin(iv, "lo", "hi", pts, "t",
        Seq("user_id"), binWidth = 50L)
      .groupBy("iv_id", "pt_id").count().filter(col("count") > 1).count()
    assert(rows == 0L)
  }

  test("asofJoin: null by-keys follow join semantics (no null-to-null matches)") {
    val left = Seq((Option(1L), 10L, 100L), (Option.empty[Long], 11L, 100L))
      .toDF("k", "lid", "t").withColumn("lts", timestamp_micros(col("t"))).drop("t")
    val right = Seq((Option(1L), 20L, 50L), (Option.empty[Long], 21L, 50L))
      .toDF("k", "rid", "t").withColumn("rts", timestamp_micros(col("t"))).drop("t")
    val got = Deltas.asofJoin(left, right, Seq("k"), "lts", "rts", payload = Seq("rid"))
      .select("lid", "asof_rid")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got(10L).contains(20L), "non-null key matches normally")
    assert(got(11L).isEmpty, "null-key left row must NOT match the null-key right row")
  }
}
