package graft.ops

import graft.SparkSpec

class GapFillSpec extends SparkSpec {

  import spark.implicits._

  test("fillInterpolate: dense spine, linear interior interpolation, per-key ranges") {
    // key a: buckets 0,3,4 observed -> 1,2 interpolate on the 0->3 segment;
    // key b: buckets 10,12 observed -> 11 is the midpoint
    val series = Seq(
      ("a", 0L, 10.0), ("a", 3L, 40.0), ("a", 4L, 20.0),
      ("b", 10L, 5.0), ("b", 12L, 9.0)).toDF("k", "bucket", "v")
    val got = GapFill.fillInterpolate(series, Seq("k"), "bucket", "v")
      .orderBy("k", "bucket")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 10.0, false), ("a", 1L, 20.0, true), ("a", 2L, 30.0, true),
      ("a", 3L, 40.0, false), ("a", 4L, 20.0, false),
      ("b", 10L, 5.0, false), ("b", 11L, 7.0, true), ("b", 12L, 9.0, false)),
      s"got $got")
    // a gap-free series round-trips unchanged
    val dense = Seq(("c", 1L, 1.5), ("c", 2L, 2.5)).toDF("k", "bucket", "v")
    val same = GapFill.fillInterpolate(dense, Seq("k"), "bucket", "v")
      .orderBy("bucket").as[(String, Long, Double, Boolean)].collect().toSeq
    assert(same == Seq(("c", 1L, 1.5, false), ("c", 2L, 2.5, false)))
  }
  test("ewma: seeded fold in pinned order; alpha validated") {
    import spark.implicits._
    // (key, ts, tie, value): series a = 1, 3, 5 -> e = ((1/2+3/2)/2... )
    // step-by-step: e0 = 1; e1 = 1*.5 + 3*.5 = 2; e2 = 2*.5 + 5*.5 = 3.5
    val df = Seq(
      ("a", 3L, 0L, 5.0), ("a", 1L, 0L, 1.0), ("a", 2L, 0L, 3.0), // shuffled input
      ("b", 1L, 0L, 7.0)                                          // single row seeds itself
    ).toDF("k", "ts", "tie", "v")
    val got = GapFill.ewma(df, Seq("k"), "ts", "tie", "v", alpha = 0.5)
      .as[(String, Double)].collect().toMap
    assert(got("a") == 3.5 && got("b") == 7.0, got.toString)
    // ties break on the tie column: same ts, tie order decides the fold
    val tied = Seq(("c", 1L, 2L, 10.0), ("c", 1L, 1L, 2.0)).toDF("k", "ts", "tie", "v")
    val e = GapFill.ewma(tied, Seq("k"), "ts", "tie", "v", alpha = 0.5)
      .as[(String, Double)].collect().head._2
    assert(e == 2.0 * 0.5 + 10.0 * 0.5, s"tie order must fold 2 then 10: $e")
    intercept[IllegalArgumentException] {
      GapFill.ewma(df, Seq("k"), "ts", "tie", "v", alpha = 0.0)
    }
  }

}
