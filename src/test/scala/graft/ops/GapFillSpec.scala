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
}
