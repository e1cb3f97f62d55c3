package graft.ops

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("exact OLS rational: known line recovered exactly") {
    // y = 3x + 7 exactly: slope_num/slope_den must reduce to 3, intercept to 7
    val df = (0L to 10L).map(x => ("g", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = Regression.exactOlsRational(df, Seq("g"), "x", "y").head()
    val (num, den, inum) = (r.getAs[Long]("slope_num"),
      r.getAs[Long]("slope_den"), r.getAs[Long]("intercept_num"))
    assert(den > 0 && num == 3 * den && inum == 7 * den)
  }

  test("matches the sequential textbook sums on random integers") {
    val rnd = new scala.util.Random(5)
    val rows = for (g <- 0 until 4; _ <- 0 until 200) yield
      (g, rnd.nextInt(60).toLong, rnd.nextInt(100000).toLong - 50000)
    val got = Regression.exactOlsRational(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den"),
          r.getAs[Long]("intercept_num"))).toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val n = vs.size.toLong
      val sx = vs.map(_._2).sum; val sy = vs.map(_._3).sum
      val sxy = vs.map(v => v._2 * v._3).sum; val sxx = vs.map(v => v._2 * v._2).sum
      assert(got(g) == (n * sxy - sx * sy, n * sxx - sx * sx, sy * sxx - sx * sxy))
    }
  }

  test("all-equal x: slope_den is 0 (undefined trend), group kept") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("g", "x", "y")
    val r = Regression.exactOlsRational(df, Seq("g"), "x", "y").head()
    assert(r.getAs[Long]("slope_den") == 0L)
  }
}
