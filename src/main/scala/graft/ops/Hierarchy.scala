package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hierarchical (recursive) aggregation over a parent forest — the
 * org-chart / BOM / category-tree rollup a relational engine usually
 * needs a recursive CTE for, expressed as bounded-round upward
 * accumulation.
 *
 * The shape that scales: per round, every node's PENDING mass moves one
 * edge toward the root and co-located mass SUMS — so the moving set
 * never exceeds one row per live node regardless of fan-in, each round
 * is one equi-join on the edge list plus one keyed agg (map-side
 * combinable, AQE-splittable), and the round count is the forest DEPTH,
 * not the node count. `localCheckpoint` per round truncates the
 * iterative lineage ([[ConnectedComponents]]' lesson); the convergence
 * probe is an `isEmpty` LIMIT-1 probe, never a count.
 */
object Hierarchy {

  /**
   * Per-node SUBTREE SUM: for every node, the sum of `value` over its
   * full descendant subtree, itself included. `edges` is the child →
   * parent list (columns `child`, `parent`; a root simply never appears
   * as a child — no sentinel rows); `values` has (v, value) and defines
   * the node set.
   *
   * Round r delivers every node's value to its distance-r ancestor:
   * `pending_0 = values`; each round `result += pending` (delivered at
   * the current holder) and `pending' = Σ_children pending` re-keyed to
   * the parent; mass at a root drains (no parent edge). `maxDepth`
   * bounds the rounds and loud-fails if pending mass survives it —
   * surviving mass means the "forest" has a cycle or exceeds the stated
   * depth, both caller contract violations.
   *
   * @return (v, subtree_sum) — one row per node in `values`
   */
  def subtreeSum(edges: DataFrame, values: DataFrame,
                 maxDepth: Int = 64,
                 localThreshold: Int = 200000): DataFrame = {
    val e = edges.select(col("child").cast("long").as("child"),
        col("parent").cast("long").as("parent"))
      .filter(col("child") =!= col("parent")).distinct().localCheckpoint()
    // small forests take the bounded-probe driver path (bfsDistances /
    // adaptive-CC house pattern — the d20 lesson: depth-many distributed
    // rounds on a few-MB forest are pure fixed cost); identical integer
    // results by construction, spec-pinned
    val eProbe = e.limit(localThreshold + 1).collect()
    if (eProbe.length <= localThreshold) {
      val vProbe = values.select(col("v").cast("long").as("v"),
        col("value").cast("long").as("m")).limit(localThreshold + 1).collect()
      if (vProbe.length <= localThreshold)
        return subtreeSumLocal(edges.sparkSession,
          eProbe.map(r => (r.getLong(0), r.getLong(1))), vProbe, maxDepth)
    }
    var pending = values.select(col("v").cast("long").as("v"),
      col("value").cast("long").as("m")).localCheckpoint()
    var result = pending
    var round = 0
    var drained = pending.isEmpty
    while (!drained && round < maxDepth) {
      round += 1
      // move one edge up: children's pending sums at their parent
      pending = pending
        .join(e.withColumnRenamed("child", "v"), "v")
        .groupBy(col("parent").as("v"))
        .agg(sum(col("m")).as("m"))
        .select(col("v"), col("m"))
        .localCheckpoint()
      drained = pending.isEmpty
      // plain union of already-checkpointed rounds: lineage stays one
      // shallow union tree and the single final agg pays one shuffle for
      // all D delivery sets together
      if (!drained) result = result.unionByName(pending)
    }
    require(drained,
      s"subtreeSum: pending mass after $maxDepth rounds — the parent " +
        "relation has a cycle or is deeper than maxDepth")
    // one row per node of `values`, even when an edge names a parent
    // outside the node set (its delivered mass is an ancestor outside
    // the caller's universe, not a phantom output row)
    result.groupBy("v").agg(sum(col("m")).as("subtree_sum"))
      .join(values.select(col("v").cast("long").as("v")).distinct(),
        Seq("v"), "left_semi")
  }

  /** Driver twin of the distributed upward accumulation — identical
    * semantics row for row: per-round mass moves to EVERY parent edge
    * (DAG fan-out multiplies), null masses ride along and a node whose
    * every contribution is null sums to null (SQL SUM), delivery at
    * ancestors outside the node set is accumulated but filtered from the
    * output, maxDepth loud-fails on undrained mass. */
  private def subtreeSumLocal(spark: org.apache.spark.sql.SparkSession,
                              edges: Array[(Long, Long)],
                              values: Array[org.apache.spark.sql.Row],
                              maxDepth: Int): DataFrame = {
    import spark.implicits._
    val parentsOf = edges.groupBy(_._1).map { case (c, es) => c -> es.map(_._2) }
    // (sum, sawNonNull) per node — SQL SUM semantics: nulls contribute
    // nothing, an all-null (or never-delivered) node yields null
    val delivered = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    var pending = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    def add(m: scala.collection.mutable.Map[Long, (Long, Boolean)],
            v: Long, s: Long, nn: Boolean): Unit = {
      val (s0, nn0) = m.getOrElse(v, (0L, false))
      m(v) = (s0 + s, nn0 || nn)
    }
    values.foreach { r =>
      val v = r.getLong(0)
      if (r.isNullAt(1)) add(pending, v, 0L, nn = false)
      else add(pending, v, r.getLong(1), nn = true)
    }
    pending.foreach { case (v, (s, nn)) => add(delivered, v, s, nn) }
    var round = 0
    while (pending.nonEmpty && round < maxDepth) {
      round += 1
      val next = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
      pending.foreach { case (v, (s, nn)) =>
        parentsOf.getOrElse(v, Array.empty[Long]).foreach { p =>
          add(next, p, s, nn)
          add(delivered, p, s, nn)
        }
      }
      pending = next
    }
    require(pending.isEmpty,
      s"subtreeSum: pending mass after $maxDepth rounds — the parent " +
        "relation has a cycle or is deeper than maxDepth")
    val nodeSet = values.map(_.getLong(0)).toSet
    delivered.iterator.filter { case (v, _) => nodeSet.contains(v) }
      .map { case (v, (s, nn)) =>
        (v, if (nn) java.lang.Long.valueOf(s) else null: java.lang.Long)
      }.toSeq.toDF("v", "subtree_sum")
  }

  /**
   * Per-node (root, depth) — the DOWNWARD complement of [[subtreeSum]]
   * (inherited attributes / path length): roots (nodes of `nodes` that
   * never appear as a child) resolve at depth 0, and each round the
   * resolved frontier's children resolve one level deeper with the same
   * root. Rounds = forest depth; per round one edge equi-join, frontier
   * ≤ one row per node at its level. Loud-fails on a cycle or depth
   * past `maxDepth` (unresolvable frontier).
   *
   * @return (v, root, depth) — one row per node in `nodes`
   */
  def depthAndRoot(edges: DataFrame, nodes: DataFrame,
                   maxDepth: Int = 64,
                   localThreshold: Int = 200000): DataFrame = {
    val e = edges.select(col("child").cast("long").as("child"),
        col("parent").cast("long").as("parent"))
      .filter(col("child") =!= col("parent")).distinct().localCheckpoint()
    val n = nodes.select(col("v").cast("long").as("v")).distinct()
    // bounded-probe driver path, same contract as subtreeSum's
    val eProbe = e.limit(localThreshold + 1).collect()
    if (eProbe.length <= localThreshold) {
      val nProbe = n.limit(localThreshold + 1).collect()
      if (nProbe.length <= localThreshold)
        return depthAndRootLocal(edges.sparkSession,
          eProbe.map(r => (r.getLong(0), r.getLong(1))),
          nProbe.map(_.getLong(0)), maxDepth)
    }
    var frontier = n
      .join(e.select(col("child").as("v")), Seq("v"), "left_anti")
      .select(col("v"), col("v").as("root"), lit(0L).as("depth"))
      .localCheckpoint()
    var result = frontier
    var round = 0
    var done = frontier.isEmpty
    while (!done && round < maxDepth) {
      round += 1
      frontier = e
        .join(frontier.select(col("v").as("parent"), col("root"),
          col("depth")), "parent")
        .select(col("child").as("v"), col("root"),
          (col("depth") + 1).as("depth"))
        .localCheckpoint()
      done = frontier.isEmpty
      if (!done) result = result.unionByName(frontier)
    }
    require(done,
      s"depthAndRoot: unresolved frontier after $maxDepth rounds — the " +
        "parent relation has a cycle or is deeper than maxDepth")
    // a cycle with NO root above it never enters the frontier at all
    // (the loop exits immediately on an empty root set) — completeness
    // must be checked explicitly or cyclic nodes silently vanish
    require(n.join(result.select("v"), Seq("v"), "left_anti").isEmpty,
      "depthAndRoot: nodes unreachable from any root — the parent " +
        "relation has a cycle")
    // one row per node of `nodes`, even when an edge names a child
    // outside the node set (frontier expansion walks ALL edges, so such
    // a child would otherwise surface as a phantom output row — the
    // same contract gap subtreeSum closes above)
    result.join(n, Seq("v"), "left_semi")
  }

  /** Driver twin of the distributed downward resolution — identical row
    * multiset: frontier rows are raw join results (a child with several
    * resolved parents yields several rows, exactly like the distributed
    * join), expansion walks edges whose child is outside the node set too
    * (filtered only at the end), the same maxDepth and unreachable-node
    * loud-fails apply. */
  private def depthAndRootLocal(spark: org.apache.spark.sql.SparkSession,
                                edges: Array[(Long, Long)],
                                nodes: Array[Long],
                                maxDepth: Int): DataFrame = {
    import spark.implicits._
    val childrenOf = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1) }
    val childSet = edges.map(_._1).toSet
    val nodeSet = nodes.toSet
    var frontier: Seq[(Long, Long, Long)] =
      nodes.filterNot(childSet.contains).map(v => (v, v, 0L)).toSeq
    val result = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    result ++= frontier
    var round = 0
    while (frontier.nonEmpty && round < maxDepth) {
      round += 1
      frontier = frontier.flatMap { case (v, root, depth) =>
        childrenOf.getOrElse(v, Array.empty[Long])
          .map(c => (c, root, depth + 1))
      }
      result ++= frontier
    }
    require(frontier.isEmpty,
      s"depthAndRoot: unresolved frontier after $maxDepth rounds — the " +
        "parent relation has a cycle or is deeper than maxDepth")
    require(nodeSet.subsetOf(result.iterator.map(_._1).toSet),
      "depthAndRoot: nodes unreachable from any root — the parent " +
        "relation has a cycle")
    result.filter { case (v, _, _) => nodeSet.contains(v) }
      .toSeq.toDF("v", "root", "depth")
  }
}
