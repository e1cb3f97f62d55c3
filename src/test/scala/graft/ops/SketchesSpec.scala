package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def events = (0 until 20000).map { i =>
    (i % 7, s"day${i % 30}", s"user${i % 4231}")
  }.toDF("grp", "day", "user")

  test("HLL estimate tracks exact distinct within sketch error") {
    val approx = Sketches.approxDistinct(events, Seq("grp"), "user")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("grp").agg(countDistinct(col("user")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for ((g, e) <- exact) {
      val a = approx(g)
      assert(math.abs(a - e).toDouble / e < 0.05, s"grp $g: exact $e approx $a")
    }
  }

  test("merged per-day sketches equal the one-shot sketch (re-mergeability)") {
    val merged = Sketches.mergedDistinct(events, fineCols = Seq("day"),
        coarseCols = Seq("grp"), valueCol = "user")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("grp").agg(countDistinct(col("user")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the union path keeps full sketch fidelity: merged daily sketches must
    // track the exact count as tightly as a one-shot sketch would (the
    // union gadget's register representation differs slightly, so the two
    // estimates are close, not bit-equal)
    for ((g, e) <- exact) {
      val m = merged(g)
      assert(math.abs(m - e).toDouble / e < 0.05, s"grp $g: exact $e merged $m")
    }
  }

  test("CMS heavy hitters: exact top-k counts with the sketch guarantee holding") {
    // zipf-ish: token t_i appears i times, i in 1..60 => top-20 is t60..t41
    val toks = (1 to 60).flatMap(i => Seq.fill(i)(f"t$i%02d")).toDF("item")
    val got = Sketches.cmsHeavyHitters(toks, "item", k = 20, eps = 0.01)
      .orderBy(col("n").desc, col("item"))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == (60 to 41 by -1).map(i => f"t$i%02d"))
    assert(got.map(_._2) == (60L to 41L by -1L))
    assert(got.forall(_._3), s"sketch guarantee violated: $got")
  }

  test("CMS estimate never under-counts (one-sided error)") {
    val toks = (1 to 500).map(i => s"w${i % 37}").toDF("item")
    val Seq(org.apache.spark.sql.Row(bytes: Array[Byte])) =
      toks.agg(Sketches.cmsSketch(col("item"), eps = 0.05)).collect().toSeq
    val exact = toks.groupBy("item").count()
      .as[(String, Long)].collect().toMap
    val ests = Sketches.cmsEstimate(bytes, exact.keys.toSeq)
    for (((item, est), _) <- exact.keys.toSeq.zip(ests).zipWithIndex)
      assert(est >= exact(item), s"$item: est $est < exact ${exact(item)}")
  }
}
