package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/**
 * Co-located equi-join via bucketing (SURVEY.md §4 / the 100 TB design
 * note): the tile base layer and a per-tile metric table bucketed by the
 * SAME key join with ZERO shuffle — at 100 TB this is the difference
 * between a network-bound sort-merge join and a local zip-join per bucket.
 * The quadkey tile id is the engine's natural bucket key: every per-tile
 * layer (base, zonal stats, patch values) shares it.
 */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum +
        other.subqueries.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed tile tables join without a shuffle; unbucketed join shuffles") {
    // plain physical plans (no AQE query-stage wrapping) and no broadcast,
    // so the shuffle count isolates exactly the bucketing effect
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedVsUnbucketed()
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  private def bucketedVsUnbucketed(): Unit = {
    val n = 10000
    val tiles = (0 until n).map(i => (s"qk$i", i * 1.0)).toDF("tile_id", "population")
    val metrics = (0 until n).map(i => (s"qk$i", i * 2.0)).toDF("tile_id", "rwi")

    spark.sql("DROP TABLE IF EXISTS b_tiles")
    spark.sql("DROP TABLE IF EXISTS b_metrics")
    tiles.write.bucketBy(8, "tile_id").sortBy("tile_id").saveAsTable("b_tiles")
    metrics.write.bucketBy(8, "tile_id").sortBy("tile_id").saveAsTable("b_metrics")

    try {
      // exactly ONE exchange: the global agg's SinglePartition collect —
      // the join inputs themselves are read pre-partitioned by bucket
      val bucketed = spark.table("b_tiles").join(spark.table("b_metrics"), "tile_id")
        .agg(sum(col("population") + col("rwi")))
      assert(shuffles(bucketed) == 1,
        s"bucketed join inputs should not shuffle:\n${bucketed.queryExecution.executedPlan}")

      // the unbucketed baseline shuffles BOTH join inputs + the agg
      val unbucketed = tiles.join(metrics, "tile_id")
        .agg(sum(col("population") + col("rwi")))
      assert(shuffles(unbucketed) == 3,
        s"unbucketed baseline should shuffle both sides:\n${unbucketed.queryExecution.executedPlan}")

      // same answer either way
      assert(bucketed.head().getDouble(0) == unbucketed.head().getDouble(0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_tiles")
      spark.sql("DROP TABLE IF EXISTS b_metrics")
    }
  }
}
