package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time profiler for a single query: runs the named query
  * `SPARK_GRAFT_PROFILE_REPS` (default 3) times and prints every Spark
  * job's duration and call site, so a multi-job operator (eager
  * localCheckpoints, range-sampling passes, iterative rounds) shows WHERE
  * a slow rep spends its time — `Bench` only sees the query total.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.JobProfile <queryName>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName>")
    val name = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.geo.GeoFunctions.ensureRegistered(spark)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val s = (System.nanoTime() - t0) / 1e9
          if (s > 0.05) System.err.println(
            f"[job] id=${je.jobId}%4d ${s}%8.3f s  $site")
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.err.println(s"==== rep $rep ====")
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      System.err.println(f"==== rep $rep total ${(System.nanoTime() - t0) / 1e9}%.3f s ====")
    }
    spark.stop()
  }
}
