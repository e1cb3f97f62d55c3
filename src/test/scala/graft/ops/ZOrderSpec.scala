package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue2 interleaves bits: hand-computed Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 1L), (5L, 9L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), 8).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // bit i of x -> position 2i+1, bit i of y -> position 2i
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 2L)
    assert(got((0L, 1L)) == 1L)
    assert(got((1L, 1L)) == 3L)
    // x=3 (11b) -> bits at 1,3 = 10; y=1 -> bit at 0 = 1; z = 11
    assert(got((3L, 1L)) == 11L)
    // x=5 (101b) -> bits 1,5 = 34; y=9 (1001b) -> bits 0,6 = 65; z = 99
    assert(got((5L, 9L)) == 99L)
  }

  test("z-sorted buckets bound BOTH dimensions; x-sorted buckets do not") {
    // a 32x32 grid: bucket it 16 ways by z-order vs by x alone, and compare
    // the summed per-bucket y-ranges — the file-skipping property
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zStats = ZOrder.zBucketStats(grid, col("x"), col("y"),
      Seq(col("x"), col("y")), nBuckets = 16)
      .select("y_min", "y_max").as[(Long, Long)].collect()
    val zSpan = zStats.map(s => s._2 - s._1).sum
    // x-major layout: every bucket of 64 consecutive (x,y) rows spans y fully
    val xW = org.apache.spark.sql.expressions.Window.orderBy(col("x"), col("y"))
    val xStats = grid.withColumn("b", ntile(16).over(xW))
      .groupBy("b").agg(min(col("y")).as("mn"), max(col("y")).as("mx"))
      .select("mn", "mx").as[(Long, Long)].collect()
    val xSpan = xStats.map(s => s._2 - s._1).sum
    // z-order: each of 16 buckets is a 8x8 quadtree block -> y-span 7 each
    assert(zSpan == 16 * 7, s"z buckets must be square blocks, got span sum $zSpan")
    assert(xSpan == 16 * 31, s"x-major buckets span all of y, got $xSpan")
  }

  test("zOrdered write path round-trips rows unchanged") {
    val df = (1L to 100L).map(i => (i % 10, i / 10, i)).toDF("x", "y", "v")
    val out = ZOrder.zOrdered(df, col("x"), col("y"), numFiles = 4)
    assert(out.columns.toSeq == Seq("x", "y", "v"))
    assert(out.select(sum(col("v"))).as[Long].head() == 5050L)
    assert(out.count() == 100L)
  }
}
