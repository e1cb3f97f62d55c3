package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an edge list — the cluster-formation
 * step of near-duplicate deduplication: MinHash/SimHash emit candidate PAIRS
 * (graft.llm.Dedup), but dropping duplicates needs per-document cluster
 * labels ("keep one representative per component"), and components routinely
 * span chains (A~B, B~C, A!~C), so a transitive closure is required.
 *
 * Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
 * Components in MapReduce and Beyond", SoCC 2014) — the shuffle-friendly
 * formulation. Each round is two keyed aggregations over the edge set (no
 * driver-side graph, no vertex broadcast), and the edge set only shrinks
 * toward a star forest rooted at each component's minimum id. Convergence is
 * O(log² n) rounds even on path graphs, where naive min-label propagation
 * needs O(diameter) rounds — the case that actually shows up when
 * boilerplate documents chain into long paths.
 *
 * Scale design: every step is a `Window.partitionBy(src)` min + projection +
 * distinct — all shuffles keyed on vertex id, cardinality bounded by the
 * (shrinking) edge count. Iteration lineage is truncated each round with
 * `localCheckpoint` (plan depth would otherwise grow linearly and overwhelm
 * the optimizer). Convergence is detected with ONE O(E) keyed aggregate (star
 * test — multi-parent and root-violation folded into a single job), run on
 * alternate rounds only: a converged star forest is a fixed point of
 * large-star∘small-star, so a skipped check costs at most one idempotent
 * extra round while halving driver-coordinated convergence polls.
 */
object ConnectedComponents {

  /** One large-star round: every node u connects its LARGER neighbors to the
    * minimum of its neighborhood (min(Γ(u) ∪ {u})). Keeps big→small edge
    * orientation (src > dst). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    val w = Window.partitionBy("src")
    // no intermediate distinct: duplicates don't affect the min-based
    // rewiring, the round-ending smallStar distinct bounds growth, and the
    // output stays ≤ |sym| rows — saving one exchange per round (a round is
    // otherwise pure fixed cost once the edge set is small)
    sym.withColumn("m", least(min(col("dst")).over(w), col("src")))
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
  }

  /** One small-star round: every node u rewires its SMALLER-or-equal
    * neighborhood (and itself) onto that neighborhood's minimum. Input and
    * output edges are big→small (src > dst). */
  private def smallStar(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("src")
    val withMin = e.withColumn("m", least(min(col("dst")).over(w), col("src")))
    withMin.select(col("dst").as("v"), col("m"))
      .union(withMin.select(col("src").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** A big→small edge set is a converged star forest iff every src points to
    * exactly one dst and no dst is itself a src (all roots are final). Both
    * conditions fold into ONE per-vertex aggregate (map-side combinable, one
    * shuffle, one action): a vertex violates iff it has >1 parent or appears
    * on both sides. */
  private def isStarForest(e: DataFrame): Boolean = {
    val roles = e.select(col("src").as("v"), lit(1L).as("n_src"), lit(0L).as("n_dst"))
      .union(e.select(col("dst").as("v"), lit(0L).as("n_src"), lit(1L).as("n_dst")))
    roles.groupBy("v")
      .agg(sum("n_src").as("ns"), sum("n_dst").as("nd"))
      .filter(col("ns") > 1 || (col("ns") > 0 && col("nd") > 0))
      .limit(1).count() == 0
  }

  /**
   * Component labels for every vertex that appears in `edges` (numeric ids;
   * normalized to long).
   *
   * Adaptive execution: the iterative algorithm's cost on a SMALL graph is
   * pure per-round fixed overhead (4 keyed exchanges + a checkpoint per
   * round, ~log² rounds) — seconds of wall time to label a few thousand
   * edges. So `labels` first probes the deduped edge count with a BOUNDED
   * read (`limit(threshold+1).collect()` — O(threshold) rows of two longs,
   * never a full count of a billion-edge graph): at or under
   * `localThreshold` edges the collected sample IS the graph and a driver
   * union-find labels it in microseconds; above it, the distributed
   * large-star/small-star path runs. Both paths produce the identical
   * min-id labeling. At corpus scale (LSH pair graphs of 10⁹ edges) the
   * probe reads `threshold+1` rows and the distributed path always runs —
   * the fast path only ever engages when the whole graph provably fits in
   * a few MB.
   *
   * @param edges  candidate pairs; self-loops and duplicates are tolerated
   * @return (id, component) where component = minimum vertex id reachable
   *         from `id` (the component's canonical representative)
   */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
             maxIter: Int = 25, localThreshold: Int = 200000): DataFrame = {
    // normalize: big→small orientation, no self-loops, deduped
    val e0 = edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("src"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val probe = e0.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold)
      return labelsLocal(edges.sparkSession, probe)
    var e = e0.localCheckpoint()
    var converged = isStarForest(e)
    var i = 0
    while (!converged && i < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      i += 1
      // poll convergence on alternate rounds (plus the last permitted one);
      // an unchecked converged round re-derives the same star forest, so
      // correctness is unaffected
      if (i % 2 == 1 || i == maxIter) converged = isStarForest(e)
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "raise maxIter (rounds needed grow ~log² of the largest component)")
    // star forest: leaves point at roots; roots label themselves
    e.select(col("src").as("id"), col("dst").as("component"))
      .union(e.select(col("dst").as("id"), col("dst").as("component")))
      .distinct()
  }

  /** Small-graph fast path: union-find (path compression, min-id roots)
    * over an already-collected, already-deduped edge sample. Produces the
    * same (id, component = min reachable id) labeling as the distributed
    * algorithm. */
  private def labelsLocal(spark: org.apache.spark.sql.SparkSession,
                          edges: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def add(x: Long): Unit = if (!parent.containsKey(x)) parent.put(x, x)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      add(a); add(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    import scala.jdk.CollectionConverters._
    val out = parent.keySet().asScala.toSeq.map(v => (v, find(v)))
    spark.createDataFrame(out).toDF("id", "component")
  }

  /** Deduplication composition: keep ONE representative per near-dup cluster
    * (the min-id member) plus every unpaired document — the step that turns
    * `Dedup.minhashLsh` pair output into an actually-deduplicated corpus. */
  def keepRepresentatives(docs: DataFrame, idCol: String,
                          pairs: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b"): DataFrame = {
    val lbl = labels(pairs, srcCol, dstCol)
    val drop = lbl.filter(col("id") =!= col("component")).select(col("id"))
    docs.join(drop.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
