package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/**
 * Proof of the bucketed co-located join layout (DataStore.writeBucketedTable):
 * two tables bucketed on the same key into the same bucket count must join
 * with ZERO Exchange — the 100 TB contract where the fact⋈fact shuffle is
 * paid once at write time. Also guards the negative: reading the same files
 * WITHOUT the catalog's bucket metadata re-introduces the shuffle, which is
 * exactly why the writer goes through saveAsTable.
 */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int =
    """\(\d+\) Exchange""".r.findAllIn(p).size

  test("bucketed tables join and aggregate with zero Exchange; raw files re-shuffle") {
    val left = (1L to 1000L).map(k => (k, k * 3)).toDF("k", "a")
    val right = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "b")
    val store = new DataStore(
      java.nio.file.Files.createTempDirectory("bucketed").toString)
    // one writer task -> one file per bucket, so the sorted-bucket
    // metadata survives and SMJ needs neither Exchange nor extra scan sort
    store.writeBucketedTable(left.repartition(1), "bk_left", "k", 8)
    store.writeBucketedTable(right.repartition(1), "bk_right", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
      val jp = fmt(joined)
      assert(exchanges(jp) == 0, s"bucketed join must not shuffle:\n$jp")
      assert(joined.count() == 1000L)

      // aggregation on the bucket key rides the same layout
      val agged = spark.table("bk_left").groupBy("k").agg(sum("a"))
      val ap = fmt(agged)
      assert(exchanges(ap) == 0, s"bucket-key agg must not shuffle:\n$ap")

      // NEGATIVE: path-based reads of the same parquet files lose the
      // bucket metadata and the join shuffles again
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val rawL = spark.read.parquet(s"$warehouse/bk_left")
      val rawR = spark.read.parquet(s"$warehouse/bk_right")
      val rawP = fmt(rawL.join(rawR, "k"))
      assert(exchanges(rawP) >= 2, s"raw-file join should shuffle:\n$rawP")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
