package graft.ops

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def seqMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    // same structural rule as the operator: ranks ⌊(n+1)/2⌋, ⌊(n+2)/2⌋
    (s((n - 1) / 2) + s(n / 2)) / 2
  }

  test("exact median: odd and even group sizes, unsorted input") {
    val df = Seq(
      ("a", 9.0), ("a", 1.0), ("a", 5.0),                 // odd: med 5
      ("b", 4.0), ("b", 1.0), ("b", 10.0), ("b", 2.0))    // even: (2+4)/2 = 3
      .toDF("g", "x")
    val got = Robust.exactMedian(df, Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 5.0, "b" -> 3.0))
  }

  test("median matches the sequential rule on random doubles") {
    val rnd = new scala.util.Random(11)
    val rows = for (g <- 0 until 6; _ <- 0 until (50 + g)) yield
      (g, rnd.nextDouble() * 1e6 - 5e5)
    val got = Robust.exactMedian(rows.toDF("g", "x"), Seq("g"), "x")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expect = rows.groupBy(_._1).map { case (g, vs) => g -> seqMedian(vs.map(_._2)) }
    assert(got == expect) // bit-identical, not approximately equal
  }

  test("MAD outliers: planted spikes are flagged, bulk is not") {
    // bulk at 10±2 (MAD 1), spikes at 1000 — |1000-10| >> 3*MAD
    val bulk = (0 until 99).map(i => ("a", 10.0 + (i % 5) - 2))
    val spikes = Seq(("a", 1000.0), ("a", -1000.0))
    val r = Robust.madOutliers((bulk ++ spikes).toDF("g", "x"), Seq("g"), "x")
      .head()
    assert(r.getAs[Long]("n") == 101)
    assert(r.getAs[Long]("n_outliers") == 2)
    assert(r.getAs[Double]("med") == 10.0)
  }

  test("MAD 0 group (constant values): only off-median rows flagged") {
    val df = (Seq.fill(10)(("c", 7.0)) :+ ("c", 7.5)).toDF("g", "x")
    val r = Robust.madOutliers(df, Seq("g"), "x").head()
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 1)
  }

  test("weighted median: lower median rule, ties collapsed before cumulation") {
    // weights: x=1 w=3, x=2 w=1 (two tied rows), x=9 w=4 → W=8, first x with
    // 2·cumw ≥ 8 is x=2 (cumw 4)
    val df = Seq(("a", 1.0, 3L), ("a", 2.0, 1L), ("a", 2.0, 0L), ("a", 9.0, 4L))
      .toDF("g", "x", "w")
    val got = Robust.weightedMedian(df, Seq("g"), "x", "w").head().getDouble(1)
    assert(got == 2.0)
    // all weight on one value dominates
    val df2 = Seq(("b", 1.0, 1L), ("b", 5.0, 10L), ("b", 7.0, 1L)).toDF("g", "x", "w")
    assert(Robust.weightedMedian(df2, Seq("g"), "x", "w").head().getDouble(1) == 5.0)
    // unit weights reduce to the lower (rank ⌈n/2⌉) median
    val df3 = Seq(("c", 1.0, 1L), ("c", 2.0, 1L), ("c", 3.0, 1L), ("c", 4.0, 1L))
      .toDF("g", "x", "w")
    assert(Robust.weightedMedian(df3, Seq("g"), "x", "w").head().getDouble(1) == 2.0)
  }

  test("nulls are dropped before ranking") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "x")
    val got = Robust.exactMedian(df, Seq("g"), "x").head().getDouble(1)
    assert(got == 2.0)
  }

  test("theilSen: lower median of pairwise slopes, outlier-proof") {
    // y = 2h + noise at h=0..4, with one wild point (h=5, x=1000): the
    // LS slope would explode, Theil-Sen's median slope stays 2
    val df = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L),
      ("a", 3L, 6L), ("a", 4L, 8L), ("a", 5L, 1000L)).toDF("g", "h", "x")
    val r = Robust.theilSen(df, "g", "h", "x").head()
    assert(r.getAs[Long]("n_pairs") == 15)
    assert(r.getAs[Double]("slope_med") == 2.0)
  }

  test("theilSen: a group past maxPoints loud-fails instead of going O(n^2)") {
    val big = (1 to 50).map(i => ("hot", i.toLong, i.toLong)).toDF("g", "h", "x")
    val e = intercept[IllegalArgumentException] {
      Robust.theilSen(big, "g", "h", "x", maxPoints = 10)
    }
    assert(e.getMessage.contains("maxPoints"), e.getMessage)
    assert(e.getMessage.contains("hot"), e.getMessage)
  }
}
