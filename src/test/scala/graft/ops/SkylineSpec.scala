package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Double)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y)
      }
    }.map(_._1).toSet

  private def run(rows: Seq[(Long, Double, Double)], buckets: Int = 8): Set[Long] =
    Skyline.pareto2d(rows.toDF("id", "x", "y"), "x", "y", buckets)
      .select("id").as[Long].collect().toSet

  test("matches the O(n²) dominance definition on random points") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i =>
      (i, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    assert(run(rows) == brute(rows))
  }

  test("ties and duplicates: all copies of a frontier point survive") {
    val rows = Seq(
      (1L, 1.0, 5.0), (2L, 1.0, 5.0),  // duplicate frontier point
      (3L, 1.0, 7.0),                   // same x, worse y → dominated
      (4L, 2.0, 5.0),                   // worse x, same y → dominated
      (5L, 3.0, 1.0), (6L, 0.0, 9.0))   // frontier
    assert(run(rows) == Set(1L, 2L, 5L, 6L))
    assert(run(rows) == brute(rows))
  }

  test("cross-bucket dominance: equal y in an earlier bucket dominates") {
    // id=1 sits in a low-x bucket; id=2 has the same y at much larger
    // (unique) x — within its own bucket it is locally undominated, so only
    // the cross-bucket cumulative-min pass can kill it
    val rows = Seq((1L, 0.0, 3.0), (2L, 99.0, 3.0), (3L, 100.0, 1.0))
    assert(run(rows, buckets = 4) == Set(1L, 3L))
  }

  test("bucket count never changes the answer (including single bucket)") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val expect = brute(rows)
    for (b <- Seq(1, 2, 7, 64)) assert(run(rows, b) == expect, s"buckets=$b")
  }

  test("degenerate inputs: all-equal x, empty frame, nulls dropped") {
    val allX = Seq((1L, 5.0, 2.0), (2L, 5.0, 1.0), (3L, 5.0, 1.0))
    assert(run(allX) == Set(2L, 3L))
    val empty: DataFrame = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    assert(Skyline.pareto2d(empty, "x", "y").count() == 0)
    val withNull = Seq((Some(1L), Some(1.0), Some(1.0)),
      (Some(2L), None, Some(0.0))).toDF("id", "x", "y")
    assert(Skyline.pareto2d(withNull, "x", "y").select("id").as[Long]
      .collect().toSet == Set(1L))
  }
}
