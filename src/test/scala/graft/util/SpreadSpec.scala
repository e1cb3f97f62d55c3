package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spread.ifNarrow: the scale-adaptive parallelism repair for CPU-dense
  * kernels over single-unsplittable-file input (guide §2.5). */
class SpreadSpec extends SparkSpec {

  private def withSpread[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.get("spark.graft.spread", "false")
    spark.conf.set("spark.graft.spread", on.toString)
    try body finally spark.conf.set("spark.graft.spread", prev)
  }

  test("narrow input is repartitioned to defaultParallelism; values unchanged") {
    withSpread(on = true) {
      import spark.implicits._
      val narrow = (1 to 100).toDF("x").coalesce(1)
      assert(narrow.rdd.getNumPartitions == 1)
      val out = Spread.ifNarrow(narrow)
      assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
      assert(out.select(sum($"x")).head.getLong(0) == 5050L)
      assert(out.count() == 100L)
    }
  }

  test("input at/above parallelism is returned untouched (no extra exchange)") {
    withSpread(on = true) {
      import spark.implicits._
      val wide = (1 to 100).toDF("x")
        .repartition(spark.sparkContext.defaultParallelism)
      val out = Spread.ifNarrow(wide)
      assert(out eq wide) // the Scala branch, not a plan node
    }
  }

  test("spark.graft.spread=false disables it even for narrow input") {
    withSpread(on = false) {
      import spark.implicits._
      val narrow = (1 to 10).toDF("x").coalesce(1)
      val out = Spread.ifNarrow(narrow)
      assert(out eq narrow)
    }
  }
}
