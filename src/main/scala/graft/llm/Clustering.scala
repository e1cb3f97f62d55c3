package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Distributed k-means (Lloyd's algorithm) over an embedding column — the
 * clustering workhorse of training-data curation (SemDeDup cells, corpus
 * bucketing, IVF coarse quantizers; cf. `Similarity.trainKMeans`, which
 * trains driver-side on a SAMPLE — this one keeps the corpus distributed).
 * Spark-shaped:
 *
 *  - ASSIGNMENT is a narrow per-row argmin against the k broadcast
 *    centroids (primitive-array UDF, one corpus pass, no shuffle),
 *  - UPDATE is one `groupBy(cluster)` aggregate per round; the only
 *    driver-side datum is the k×dim centroid table itself — inherently
 *    driver state, like [[Bpe.learnMerges]]' rules or the IVF codebooks,
 *  - rounds are a driver loop over those two steps: per-round cost is one
 *    corpus pass + one k-cardinality shuffle, nothing quadratic.
 *
 * Determinism (the v06 oracle contract): init is the k lowest-id vectors
 * (no RNG); every float widens to double BEFORE any arithmetic (exact);
 * distances fold dimensions in ascending order with strict `<` argmin
 * (ties pick the lower cluster id); the ordered centroid update folds
 * member vectors in ascending-id order FROM THE FIRST MEMBER (no zero
 * seed — sidesteps the ±0.0 repr hazard), so every emitted double is an
 * exactly-rounded function of a fixed fold order and an external engine
 * can replay the rounds bit for bit. `orderedFold = false` switches the
 * update to per-dimension SUMs — map-side combinable, the 100 TB path,
 * same algorithm with the float-summation order unpinned.
 */
object Clustering {

  // Array[Double] parameters, deliberately: the frame's vectors are
  // ALREADY widened to double — a float-array UDF signature would make
  // Spark insert a narrowing array cast and break the bit contract
  private def assignUdf(cents: Array[Array[Double]]) = udf { (v: Array[Double]) =>
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var acc = 0.0
      var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val d = v(i) - c(i); acc += d * d; i += 1 }
      if (acc < bestD) { bestD = acc; best = j }
      j += 1
    }
    best
  }

  private def distUdf(cents: Array[Array[Double]]) = udf { (v: Array[Double], j: Int) =>
    val c = cents(j)
    var acc = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val d = v(i) - c(i); acc += d * d; i += 1 }
    acc
  }

  /** Fold the sorted (id, vec) member structs from the FIRST member —
    * ascending-id pairwise adds, the engine-portable order. */
  private def orderedVecSum(members: Column): Column =
    aggregate(
      slice(members, lit(2), size(members) - 1),
      element_at(members, 1).getField("v"),
      (acc, x) => zip_with(acc, x.getField("v"), (a, b) => a + b))

  /**
   * Run `iterations` Lloyd rounds with `k` clusters. Returns one row per
   * cluster: `(cluster, n, centroid: array<double>, inertia)` where `n`
   * counts the members of the LAST assignment, `centroid` is the mean
   * that assignment produced, and `inertia` is that assignment's
   * within-cluster squared error against the final centroid (folded in
   * ascending-id order when `orderedFold`).
   */
  def lloyd(df: DataFrame, idCol: String, vecCol: String, k: Int,
            iterations: Int, orderedFold: Boolean = false): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val spark = df.sparkSession
    val vd = transform(col(vecCol), x => x.cast("double"))
    val base = df.select(col(idCol).cast("long").as("id"), vd.as("v"))
      .localCheckpoint() // one corpus materialization; rounds re-scan it
    val dim = base.select(size(col("v"))).head().getInt(0)

    // deterministic init: the k lowest-id vectors
    var cents: Array[Array[Double]] = base.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)

    var lastAssign: DataFrame = null
    for (_ <- 1 to iterations) {
      val assigned = base.withColumn("cluster", assignUdf(cents)(col("v")))
      val upd =
        if (orderedFold)
          assigned.groupBy("cluster").agg(
            count(lit(1)).as("n"),
            sort_array(collect_list(struct(col("id"), col("v")))).as("__mvs"))
            .select(col("cluster"), col("n"),
              transform(orderedVecSum(col("__mvs")), s => s / col("n")).as("centroid"))
        else
          assigned.groupBy("cluster").agg(
            count(lit(1)).as("n"),
            array((0 until dim).map(i => sum(element_at(col("v"), i + 1))): _*).as("__sum"))
            .select(col("cluster"), col("n"),
              transform(col("__sum"), s => s / col("n")).as("centroid"))
      val rows = upd.orderBy(col("cluster")).collect() // bounded: k rows
      val next = cents.clone()
      rows.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](2).toArray // empty cluster keeps old
      }
      cents = next
      lastAssign = assigned
    }

    val withD = lastAssign.withColumn("d2", distUdf(cents)(col("v"), col("cluster")))
    val inertia =
      if (orderedFold)
        withD.groupBy("cluster").agg(
          count(lit(1)).as("n"),
          sort_array(collect_list(struct(col("id"), col("d2")))).as("__ds"))
          .select(col("cluster"), col("n"),
            aggregate(slice(col("__ds"), lit(2), size(col("__ds")) - 1),
              element_at(col("__ds"), 1).getField("d2"),
              (acc, x) => acc + x.getField("d2")).as("inertia"))
      else
        withD.groupBy("cluster").agg(count(lit(1)).as("n"), sum(col("d2")).as("inertia"))

    val centDf = spark.createDataFrame(
      cents.zipWithIndex.toSeq.map { case (c, j) => (j, c.toSeq) })
      .toDF("cluster", "centroid")
    inertia.join(centDf, "cluster")
      .select(col("cluster"), col("n"), col("centroid"), col("inertia"))
  }
}
