package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph primitives over edge-list DataFrames (columns
 * `src`/`dst`), the shapes a dedup/link-analysis pipeline needs beyond
 * [[ConnectedComponents]].
 *
 * Triangle counting uses the degree-orientation algorithm (Suri & Vassilvitskii,
 * "Counting Triangles and the Curse of the Last Reducer", WWW'11): orient
 * every undirected edge from the lower-degree endpoint to the higher
 * (ties by id), then count directed wedges closed by an oriented edge.
 * Each wedge is generated at its lowest-degree vertex, so per-vertex work
 * is O(d_min²) — the hub that would make the naive self-join quadratic
 * generates NO wedges. Two shuffles (degree join, wedge-close join), both
 * equi-joins on vertex/edge keys — AQE-splittable, no all-pairs.
 */
object Graph {

  /** Canonical undirected edge set: dedup, drop self-loops, src < dst. */
  def canonicalEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
    e.filter(col("src") < col("dst")).distinct()
  }

  /**
   * PageRank by power iteration over the DIRECTED edge list (distinct
   * edges, self-loops dropped): `r' = (1−d)/N + d·Σ_in r/outdeg`, dangling
   * mass dropped (a sink's rank re-enters only through the teleport term —
   * deterministic and documented; the classic redistribute variant adds a
   * per-round global scalar exchange for little analytical difference).
   *
   * Scale: the edge set and out-degrees are checkpointed ONCE (not
   * recomputed per round); each round is one VERTEX-sized join (rank ⋈
   * out-degree, pre-dividing r/outdeg), one edge-wide equi-join on `src`,
   * and one aggregation keyed on `dst` — AQE-splittable shuffles whose
   * width follows the edge set; `localCheckpoint` per round truncates the
   * iterative lineage exactly like [[ConnectedComponents]]. N is a driver
   * scalar folded into the teleport constant (verts is already
   * materialized, so the count is one cheap job — not a per-round
   * broadcast-nested-loop crossJoin).
   *
   * `orderedFold = true` sums each vertex's inbound contributions in
   * ascending-`src` order with an explicit left fold instead of `sum()`.
   * Same O(E) work, but the floating-point result becomes ENGINE-PORTABLE
   * (every add is IEEE exactly-rounded, so a fixed fold order fixes the
   * bits — the q45 EWMA trick) — that's what lets an external oracle
   * hash-check 5 rounds of doubles. The default unordered `sum` is the
   * 100 TB path: map-side partials, no per-vertex array.
   */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
               orderedFold: Boolean = false,
               localThreshold: Int = 200000): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    // iterative rounds on a small graph are pure fixed cost (the d20/CC
    // lesson): probe the deduped edge count with a BOUNDED read and run
    // the rounds driver-side when the whole graph is provably a few MB —
    // same ascending-src fold order, so the result is bit-identical to the
    // distributed orderedFold path (spec'd). ScaleBench drives the
    // distributed path at 10M edges.
    // checkpoint the deduped edges ONCE, BEFORE the probe — the probe and
    // round 0 then share one dedup pass instead of each replaying it
    val eCk = e.localCheckpoint()
    val probe = eCk.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold)
      return pageRankLocal(edges.sparkSession, probe, iterations, damping)
    val verts = eCk.select(col("src").as("v"))
      .union(eCk.select(col("dst").as("v"))).distinct().localCheckpoint()
    val nVerts = verts.count() // driver scalar; verts is materialized
    val outdegV = eCk.groupBy("src").agg(count(lit(1)).as("__od"))
      .withColumnRenamed("src", "v").localCheckpoint()
    // teleport constant precomputed with the SAME double ops Catalyst's
    // constant folding performed ((1.0 - d) then / N) — bit-identical to
    // the previous per-row expression and to pageRankLocal
    val teleport = (1.0 - damping) / nVerts
    var ranks = verts.select(col("v"), lit(1.0 / nVerts).as("r"))
    for (_ <- 1 to iterations) {
      // vertex-sized join first: r/outdeg divides once per SOURCE vertex,
      // then ONE edge-wide equi-join attaches the ready-made contribution
      val srcRank = ranks.join(outdegV, Seq("v"))
        .select(col("v").as("src"), (col("r") / col("__od")).as("c"))
      val contribs = eCk.join(srcRank, "src")
        .select(col("dst").as("v"), col("src"), col("c"))
      val sums =
        if (orderedFold)
          contribs.groupBy("v").agg(
            aggregate(sort_array(collect_list(struct(col("src"), col("c")))),
              lit(0.0), (acc, x) => acc + x.getField("c")).as("__s"))
        else
          contribs.groupBy("v").agg(sum(col("c")).as("__s"))
      ranks = verts.join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit(teleport) + lit(damping) * coalesce(col("__s"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Driver power iteration over a bounded collected edge set — the exact
    * arithmetic twin of the distributed ordered fold: contributions fold
    * in ascending-src order from a 0.0 accumulator, `r/outdeg` divides a
    * long-backed double, and the update is `(1−d)/N + d·s` in that
    * association order. Each step is IEEE exactly-rounded, so fixing the
    * order fixes the bits across paths AND engines. */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
                            rows: Array[org.apache.spark.sql.Row],
                            iterations: Int, damping: Double): DataFrame = {
    import spark.implicits._
    val edges = rows.map(r => (r.getLong(0), r.getLong(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = verts.length
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val inbound = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1).sorted }
    var r = verts.iterator.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      r = verts.iterator.map { v =>
        var acc = 0.0
        inbound.getOrElse(v, Array.empty[Long])
          .foreach(s => acc = acc + r(s) / outdeg(s))
        v -> ((1.0 - damping) / n + damping * acc)
      }.toMap
    }
    verts.toSeq.map(v => (v, r(v))).toDF("v", "r")
  }

  /**
   * Multi-source BFS: shortest hop-count from ANY source to every reachable
   * vertex (≤ `maxDepth` hops), over the directed edge list. Level-
   * synchronous frontier expansion — the canonical distributed-BFS shape:
   * each round is one equi-join of the edge list with the CURRENT frontier
   * (shuffle keyed on `src`, width follows the frontier, AQE-splittable),
   * a distinct, and a left-anti join against the settled set; rounds run
   * until the frontier empties or `maxDepth`. `localCheckpoint` per round
   * truncates the iterative lineage ([[ConnectedComponents]]' lesson), and
   * the empty-frontier poll is `isEmpty` (a LIMIT-1 probe, never a count).
   *
   * Small graphs take the bounded-probe driver path (the d20/CC lesson:
   * iterative rounds on a few-MB graph are pure fixed cost) — a collected
   * adjacency-list BFS producing identical integer distances, so the two
   * paths are interchangeable (spec'd) and hash-safe for an external
   * oracle: hop counts are exact integers, no float anywhere.
   *
   * @param sources one column `v`; distances are 0 at sources
   * @return columns (v: long, d: int), reached vertices only
   */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxDepth: Int,
                   localThreshold: Int = 200000): DataFrame = {
    require(maxDepth >= 0, s"maxDepth=$maxDepth must be >= 0")
    // one checkpoint serves the probe AND every BFS round's frontier join
    // (un-checkpointed, the distinct would replay per round and the probe
    // would add a full extra pass)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val src = sources.select(col("v").cast("long").as("v")).distinct()
    val probe = e.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold) {
      val srcProbe = src.limit(localThreshold + 1).collect() // bounded
      require(srcProbe.length <= localThreshold,
        s"more than $localThreshold sources on a local-path graph")
      return bfsLocal(edges.sparkSession, probe, srcProbe.map(_.getLong(0)), maxDepth)
    }
    var dist = src.withColumn("d", lit(0)).localCheckpoint()
    var frontier = dist.select("v")
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = e.join(frontier.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v")).distinct()
        .join(dist.select("v"), Seq("v"), "left_anti")
        .withColumn("d", lit(depth)).localCheckpoint()
      dist = dist.unionByName(next).localCheckpoint()
      frontier = next.select("v")
    }
    dist
  }

  /** Driver BFS over a bounded collected edge set — integer twin of the
    * distributed path (identical distances by construction). */
  private def bfsLocal(spark: org.apache.spark.sql.SparkSession,
                       rows: Array[org.apache.spark.sql.Row],
                       sources: Array[Long], maxDepth: Int): DataFrame = {
    import spark.implicits._
    val adj = rows.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val dist = scala.collection.mutable.Map.empty[Long, Int]
    var frontier = sources.distinct.toSeq
    frontier.foreach(v => dist(v) = 0)
    var depth = 0
    while (depth < maxDepth && frontier.nonEmpty) {
      depth += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
        .distinct.filterNot(dist.contains)
      frontier.foreach(v => dist(v) = depth)
    }
    dist.toSeq.map { case (v, dd) => (v, dd) }.toDF("v", "d")
  }

  /**
   * Synchronous label propagation (Raghavan et al. 2007) over the
   * UNDIRECTED graph — community detection for near-dup cluster graphs
   * where [[ConnectedComponents]] is too coarse (CC merges everything
   * reachable; LPA splits a component into densely-linked communities).
   *
   * Deterministic variant: labels start as vertex ids; each round every
   * vertex adopts the label held by the MOST of its neighbours, ties
   * broken by the smallest label. All updates in a round read the
   * previous round's labels (synchronous — no update-order dependence),
   * so `rounds` rounds produce one well-defined integer labelling that an
   * external engine can replay exactly.
   *
   * Scale: per round one edge-wide equi-join on the neighbour key and two
   * keyed aggregations — (v, label) counts, then an argmax re-key on v via
   * `max(struct(cnt, -label))` (no window, map-side combinable).
   * `localCheckpoint` per round truncates the iterative lineage; small
   * graphs take the bounded-probe driver path (the d20/CC lesson) with
   * identical integer output.
   *
   * @return columns (v: long, label: long)
   */
  def labelPropagation(edges: DataFrame, rounds: Int,
                       localThreshold: Int = 200000): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    // one canonicalization pass shared by the probe and the neighbour list
    val canon = canonicalEdges(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))).localCheckpoint()
    val probe = canon.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold)
      return labelPropagationLocal(edges.sparkSession, probe, rounds)
    // bidirectional neighbour list, checkpointed once
    val bi = canon.select(col("src").as("v"), col("dst").as("nbr"))
      .union(canon.select(col("dst").as("v"), col("src").as("nbr")))
      .localCheckpoint()
    var labels = bi.select(col("v")).distinct()
      .select(col("v"), col("v").as("label")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val nbrLabels = bi.join(
        labels.select(col("v").as("nbr"), col("label")), "nbr")
      val counts = nbrLabels.groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("__cnt"))
      // argmax with min-label tie-break: max over (cnt, -label)
      labels = counts.groupBy("v")
        .agg(max(struct(col("__cnt"), (-col("label")).as("__nl"))).as("__m"))
        .select(col("v"), (-col("__m.__nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Driver synchronous LPA over a bounded collected edge set — integer
    * twin of the distributed path (identical labels by construction). */
  private def labelPropagationLocal(spark: org.apache.spark.sql.SparkSession,
                                    rows: Array[org.apache.spark.sql.Row],
                                    rounds: Int): DataFrame = {
    import spark.implicits._
    val canon = rows.map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    val verts = nbrs.keys.toArray.sorted
    var labels = verts.iterator.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = verts.iterator.map { v =>
        val cnt = scala.collection.mutable.Map.empty[Long, Long]
        nbrs(v).foreach(n => cnt(labels(n)) = cnt.getOrElse(labels(n), 0L) + 1L)
        // max count, ties smallest label
        v -> cnt.toSeq.map { case (l, c) => (c, -l) }.max._2.unary_-
      }.toMap
    }
    verts.toSeq.map(v => (v, labels(v))).toDF("v", "label")
  }

  /**
   * Bellman-Ford single/multi-source shortest paths over the DIRECTED
   * weighted edge list (columns `src`, `dst`, `w` — INTEGER weights, so
   * every distance is an exact long and the result is engine-portable
   * with no float anywhere). Distances after at most `maxRounds`
   * synchronous relaxation rounds: each round relaxes EVERY edge whose
   * source is settled (`d' = min(d, min_in(d_src + w))`), which is the
   * classic round-synchronous Bellman-Ford — after k rounds every
   * shortest path of ≤ k hops is final, and extra rounds are no-ops, so
   * the early exit below never changes the result vs a fixed unrolled
   * round count (what lets a SQL oracle replay it).
   *
   * Scale: per round ONE edge-wide equi-join on `src` (shuffle width
   * follows the edge set, AQE-splittable) + one min-agg keyed on vertex
   * (map-side combinable). Convergence is detected with a 3-scalar
   * fingerprint (vertex count + the total distance split into exact
   * mod/div-by-prime partial sums, so no raw `sum(dist)` can overflow
   * under ANSI at scale — min-relaxation is monotone non-increasing, so
   * a stable triple means a fixpoint), cheap driver scalars per round
   * rather than a change-detection join.
   * `localCheckpoint` per round; bounded-probe driver path on small
   * graphs, bit-identical (integers).
   *
   * @param sources one column `v`; distances are 0 at sources
   * @return columns (v: long, dist: long), reached vertices only
   */
  def shortestPaths(edges: DataFrame, sources: DataFrame, maxRounds: Int,
                    localThreshold: Int = 200000): DataFrame = {
    require(maxRounds >= 0, s"maxRounds=$maxRounds must be >= 0")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .filter(col("src") =!= col("dst")).groupBy("src", "dst")
      .agg(min(col("w")).as("w")) // parallel edges: keep the cheapest
    val src = sources.select(col("v").cast("long").as("v")).distinct()
    // one checkpoint of the min-weight edge set serves probe + all rounds
    val eCk = e.localCheckpoint()
    val probe = eCk.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold) {
      val srcProbe = src.limit(localThreshold + 1).collect() // bounded
      require(srcProbe.length <= localThreshold,
        s"more than $localThreshold sources on a local-path graph")
      return shortestPathsLocal(edges.sparkSession, probe,
        srcProbe.map(_.getLong(0)), maxRounds)
    }
    var dist = src.withColumn("dist", lit(0L)).localCheckpoint()
    var fingerprint = (-1L, -1L, -1L)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      round += 1
      val relaxed = eCk.join(dist.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("v").agg(min(col("dist")).as("dist")).localCheckpoint()
      // exact overflow-free total: split each dist into (div, mod) by a
      // large prime — Σ true = P·Σdiv + Σmod, and both partial sums stay
      // far from long range however big the graph (a raw sum(dist) would
      // THROW under ANSI at scale). (count, Σdiv, Σmod) equality ⟺
      // (count, true Σ) equality, and min-relaxation is monotone, so a
      // stable triple proves the fixpoint.
      val P = 1000000007L
      val fp = dist.agg(count(lit(1)),
          // (dist - pmod) is exactly divisible, so integer `div` recovers
          // the exact quotient for any sign — no double division anywhere
          coalesce(sum(expr(s"(dist - pmod(dist, ${P}L)) div ${P}L")), lit(0L)),
          coalesce(sum(pmod(col("dist"), lit(P))), lit(0L)))
        .collect()(0) // 3 scalars
      val next = (fp.getLong(0), fp.getLong(1), fp.getLong(2))
      converged = next == fingerprint
      fingerprint = next
    }
    dist
  }

  /** Driver Bellman-Ford over a bounded collected edge set — integer twin
    * of the distributed path (identical distances by construction). */
  private def shortestPathsLocal(spark: org.apache.spark.sql.SparkSession,
                                 rows: Array[org.apache.spark.sql.Row],
                                 sources: Array[Long], maxRounds: Int): DataFrame = {
    import spark.implicits._
    val e = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    sources.distinct.foreach(v => dist(v) = 0L)
    var round = 0
    var changed = true
    while (round < maxRounds && changed) {
      round += 1
      changed = false
      // synchronous: relax against the PREVIOUS round's distances
      val prev = dist.toMap
      e.foreach { case (s, d, w) =>
        prev.get(s).foreach { ds =>
          val cand = ds + w
          if (dist.get(d).forall(cand < _)) { dist(d) = cand; changed = true }
        }
      }
    }
    dist.toSeq.map { case (v, dd) => (v, dd) }.toDF("v", "dist")
  }

  /**
   * Newman modularity of a community labelling, as an EXACT RATIONAL
   * (the q56 contract — no float anywhere): for undirected communities,
   * `Q = Σ_c (l_c/m − (D_c/2m)²)` with l_c = intra-community edges,
   * D_c = degree sum of community c, m = |edges|. Over the common
   * denominator: `q_num = Σ_c (4·m·l_c − D_c²)`, `q_den = 4m²` —
   * all 64-bit-safe integers up to m ≈ 1.5·10⁹ edges.
   *
   * The quality gate for [[labelPropagation]]'s output (and any other
   * clustering of a dedup-pair graph): one edge join against the label
   * map (twice, both endpoint sides), one degree agg, two community-keyed
   * aggs — no per-pair communication beyond the edge list itself.
   *
   * @param labels columns (v, label)
   * @return one row: m_edges, n_communities, q_num, q_den
   */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    val lab = labels.select(col("v").cast("long").as("v"),
      col("label").cast("long").as("label")).localCheckpoint()
    val cCk = canon.localCheckpoint()
    val m = cCk.count() // driver scalar, one agg job on the materialized edges
    val withLabels = cCk
      .join(lab.select(col("v").as("src"), col("label").as("__la")), "src")
      .join(lab.select(col("v").as("dst"), col("label").as("__lb")), "dst")
    val lc = withLabels.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label")).agg(count(lit(1)).as("__lc"))
    val dc = cCk.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("__d"))
      .join(lab, "v")
      .groupBy("label").agg(sum(col("__d")).as("__dc"))
    dc.join(lc, Seq("label"), "left")
      .select((lit(4L * m) * coalesce(col("__lc"), lit(0L)) -
        col("__dc") * col("__dc")).as("__t"))
      .agg(count(lit(1)).as("n_communities"), sum(col("__t")).as("q_num"))
      .select(lit(m).as("m_edges"), col("n_communities"), col("q_num"),
        lit(4L * m * m).as("q_den"))
  }

  /** Total triangle count of the undirected graph. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
    val deg = canon.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient from lower (deg, id) to higher (deg, id)
    val withDeg = canon
      .join(deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "deg_src"), Seq("src"))
      .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "deg_dst"), Seq("dst"))
    val oriented = withDeg.select(
      when(col("deg_src") < col("deg_dst") ||
        (col("deg_src") === col("deg_dst") && col("src") < col("dst")),
        struct(col("src").as("lo"), col("dst").as("hi")))
        .otherwise(struct(col("dst").as("lo"), col("src").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges at the low vertex: (lo)->(a), (lo)->(b) with a<b, closed by a->b or b->a;
    // oriented edges stored canonically ordered by (deg,id), so close on the
    // canonical (min,max) form of (a,b)
    val w1 = oriented.select(col("lo"), col("hi").as("a"))
    val w2 = oriented.select(col("lo"), col("hi").as("b"))
    val wedges = w1.join(w2, Seq("lo")).filter(col("a") < col("b"))
    val closing = oriented.select(
      least(col("lo"), col("hi")).as("a"), greatest(col("lo"), col("hi")).as("b"))
    wedges.join(closing, Seq("a", "b"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Strongly connected components of a DIRECTED edge list — the coloring
   * / FW-BW-MIN algorithm (Orzan 2004; Slota, Rajamanickam & Madduri,
   * IPDPS'14) with the standard TRIM phase, the label-based SCC for
   * vertex-centric engines:
   *
   *  0. trim: iteratively peel vertices with no remaining in-edges or no
   *     remaining out-edges (each a singleton SCC) — real link/dedup
   *     graphs are mostly acyclic, so trees, chains and DAG tails
   *     resolve here with two cheap anti-joins per peel instead of
   *     paying the coloring fixpoint;
   *  1. forward MIN-label propagation to a fixpoint — `color(v)` becomes
   *     the smallest vertex id that can REACH v along remaining edges;
   *  2. each color class's root (`color(v) == v`) seeds a BACKWARD
   *     reachability restricted to edges whose endpoints share the color
   *     — exactly the vertices both reached-by and reaching the root,
   *     i.e. the root's whole SCC (labelled by the root id);
   *  3. assign those vertices, drop them (and their edges) from the
   *     active subgraph, repeat.
   *
   * Every outer round settles at least one SCC per remaining color class
   * (trivial SCCs settle in droves — a root with no same-color in-edges
   * is its own component), so rounds track the depth of the SCC
   * condensation DAG, not the vertex count. Scale shape: each inner step
   * is one edge-wide equi-join plus a vertex-keyed min/distinct agg —
   * AQE-splittable; `localCheckpoint` truncates the iterative lineage per
   * step and convergence tests are 3-scalar overflow-free fingerprints
   * (the [[shortestPaths]] prime-split trick). Small graphs take the
   * probe-bounded driver path — an iterative Tarjan, bit-identical
   * labels by construction (both label by min member id).
   *
   * @return (v, component) with component = min vertex id of v's SCC
   */
  def stronglyConnectedComponents(edges: DataFrame, maxOuterRounds: Int = 30,
                                  localThreshold: Int = 200000): DataFrame = {
    val eAll = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // vertex set BEFORE the self-loop filter: a vertex whose only edge is
    // a self-loop is a legitimate singleton SCC and must appear in the
    // output, not vanish with its filtered edge
    val vertsAll = eAll.select(col("src").as("v"))
      .unionByName(eAll.select(col("dst").as("v"))).distinct()
    // checkpointed before the probe: one dedup pass for probe + round 0
    val e0 = eAll.filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val probe = e0.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold) {
      val probeV = vertsAll.limit(localThreshold + 1).collect()
      if (probeV.length <= localThreshold)
        return sccLocal(edges.sparkSession,
          probe.map(r => (r.getLong(0), r.getLong(1))),
          probeV.map(_.getLong(0)))
    }
    val P = 1000000007L
    def fp(df: DataFrame, c: String): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(expr(s"($c - pmod($c, ${P}L)) div ${P}L")), lit(0L)),
        coalesce(sum(pmod(col(c), lit(P))), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var e = e0 // already checkpointed above
    var verts = vertsAll.localCheckpoint()
    var assigned = verts.limit(0).withColumn("component", lit(0L)).localCheckpoint()
    var outer = 0
    var remaining = verts.count()
    while (remaining > 0 && outer < maxOuterRounds) {
      outer += 1
      // 0. TRIM (the FW-BW-Trim standard): peel vertices with no
      // remaining in-edges or no remaining out-edges — each is its own
      // singleton SCC, and real link/dedup graphs are MOSTLY acyclic, so
      // whole trees/chains resolve here with two anti-joins per peel
      // instead of paying the coloring fixpoint for them
      var trimmed = true
      while (trimmed && remaining > 0) {
        val srcs = e.select(col("src").as("v")).distinct()
        val dsts = e.select(col("dst").as("v")).distinct()
        val peel = verts.join(dsts, Seq("v"), "left_anti")
          .unionByName(verts.join(srcs, Seq("v"), "left_anti"))
          .distinct().localCheckpoint()
        val nPeel = peel.count()
        if (nPeel == 0) trimmed = false
        else {
          assigned = assigned
            .unionByName(peel.withColumn("component", col("v")))
            .localCheckpoint()
          verts = verts.join(peel, Seq("v"), "left_anti").localCheckpoint()
          e = e.join(peel.select(col("v").as("src")), Seq("src"), "left_anti")
            .join(peel.select(col("v").as("dst")), Seq("dst"), "left_anti")
            .select("src", "dst").localCheckpoint()
          remaining -= nPeel
        }
      }
      if (remaining == 0) return assigned
      // 1. forward min-label propagation to fixpoint
      var color = verts.withColumn("color", col("v")).localCheckpoint()
      var cfp = (-1L, -1L, -1L)
      var stable = false
      while (!stable) {
        val msgs = e.join(color.withColumnRenamed("v", "src"), "src")
          .select(col("dst").as("v"), col("color"))
        color = color.unionByName(msgs)
          .groupBy("v").agg(min(col("color")).as("color")).localCheckpoint()
        val next = fp(color, "color") // min-label is monotone ⇒ stable sum = fixpoint
        stable = next == cfp
        cfp = next
      }
      // 2. backward reachability from each root inside its color class
      val eSame = e
        .join(color.select(col("v").as("src"), col("color").as("__cs")), "src")
        .join(color.select(col("v").as("dst"), col("color").as("__cd")), "dst")
        .filter(col("__cs") === col("__cd"))
        .select(col("src"), col("dst"), col("__cs").as("component"))
        .localCheckpoint()
      var reached = color.filter(col("v") === col("color"))
        .select(col("v"), col("color").as("component")).localCheckpoint()
      var rfp = (-1L, -1L, -1L)
      stable = false
      while (!stable) {
        val back = eSame.join(reached.withColumnRenamed("v", "dst"),
            Seq("dst", "component"))
          .select(col("src").as("v"), col("component"))
        reached = reached.unionByName(back).distinct().localCheckpoint()
        val next = fp(reached, "component") // grow-only ⇒ stable size = fixpoint
        stable = next == rfp
        rfp = next
      }
      // 3. commit this round's SCCs, shrink the active subgraph
      assigned = assigned.unionByName(reached).localCheckpoint()
      verts = verts.join(reached.select("v"), Seq("v"), "left_anti").localCheckpoint()
      e = e.join(reached.select(col("v").as("src")), Seq("src"), "left_anti")
        .join(reached.select(col("v").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst").localCheckpoint()
      remaining = verts.count()
    }
    require(remaining == 0,
      s"SCC did not settle within $maxOuterRounds outer rounds: $remaining vertices " +
        "unassigned — raise maxOuterRounds (bound tracks the condensation-DAG depth)")
    assigned
  }

  /** Driver path: iterative Tarjan over a bounded collected edge set —
    * explicit stack, no recursion; components labelled by min member id
    * (identical labels to the distributed path by construction). */
  private def sccLocal(spark: org.apache.spark.sql.SparkSession,
                       es: Array[(Long, Long)], allVerts: Array[Long]): DataFrame = {
    import spark.implicits._
    val adj = es.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2) }
    val verts = allVerts.distinct
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    verts.foreach { root =>
      if (!index.contains(root)) {
        // frames: (vertex, next-child cursor)
        val frames = scala.collection.mutable.ArrayBuffer((root, 0))
        index(root) = counter; low(root) = counter; counter += 1
        stack += root; onStack += root
        while (frames.nonEmpty) {
          val (v, ci) = frames.last
          val children = adj.getOrElse(v, Array.empty[Long])
          if (ci < children.length) {
            frames(frames.length - 1) = (v, ci + 1)
            val w = children(ci)
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack += w
              frames += ((w, 0))
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          } else {
            frames.remove(frames.length - 1)
            if (frames.nonEmpty) {
              val p = frames.last._1
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) {
              // pop the SCC, label by its min member id
              val members = scala.collection.mutable.ArrayBuffer.empty[Long]
              var done = false
              while (!done) {
                val w = stack.remove(stack.length - 1); onStack -= w
                members += w
                done = w == v
              }
              val label = members.min
              members.foreach(m => comp(m) = label)
            }
          }
        }
      }
    }
    comp.toSeq.toDF("v", "component")
  }

  /**
   * K-core decomposition: per-vertex CORENESS — the largest k such that
   * the vertex survives in the k-core (the maximal subgraph where every
   * vertex keeps degree ≥ k). The standard web/link-graph quality signal
   * for a crawl pipeline: low-coreness vertices are fringe/orphan pages,
   * a high-coreness set is the densely interlinked hub mass (and the
   * cheap dense-subgraph proxy for link-spam farms).
   *
   * Distributed PEELING over the undirected edge list ([[canonicalEdges]]
   * normalization): for k = 1, 2, … cascade-delete every vertex whose
   * CURRENT degree is < k until fixpoint; a vertex deleted during phase k
   * has coreness k−1. Per round: one degree aggregation (map-side
   * combinable) + two anti-joins to drop peeled endpoints — all
   * equi-shuffles on vertex keys, AQE-splittable, no all-pairs anywhere.
   * `localCheckpoint` truncates the iterative lineage per round (the
   * CC/PageRank contract). Round count = Σ_k (cascade depth of phase k),
   * bounded by `maxRounds` with a LOUD fail: a long path peels O(length/2)
   * rounds from both ends — the same diameter caveat SCC documents — while
   * real web graphs cascade shallowly per phase. Integer-only state, so
   * the result is engine-portable with no fold-order contract.
   *
   * @return (v, coreness) — one row per vertex appearing in `edges`
   */
  def kCoreness(edges: DataFrame, maxK: Int = 128,
                maxRounds: Int = 512, localThreshold: Int = 200000): DataFrame = {
    val spark = edges.sparkSession
    // ONE checkpoint of the canonical edge set serves both the bounded
    // probe and (on the distributed path) round 0 of the peel — probing
    // an un-checkpointed canon would burn a full extra dedup pass, then
    // recompute it again for the checkpoint below
    val canon = canonicalEdges(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))).localCheckpoint()
    // iterative peel rounds on a small graph are pure fixed cost (the
    // pageRank/bfs/SCC lesson): probe the deduped edge count BOUNDED and
    // peel driver-side when the whole graph is provably a few MB —
    // coreness is graph-invariant, so the two paths agree exactly
    // (spec'd); the ScaleBench kcore section drives the distributed path
    // at 2M vertices with localThreshold = 0.
    val probe = canon.limit(localThreshold + 1).collect() // bounded by construction
    if (probe.length <= localThreshold)
      return kCorenessLocal(spark, probe, maxK)
    var e = canon
    var remaining = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint()
    // accumulate per-phase peels as already-checkpointed slices; one final
    // union keeps the plan a shallow union tree (the subtreeSum pattern)
    val peels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var k = 1
    var rounds = 0
    while (!remaining.isEmpty) {
      rounds += 1
      require(rounds <= maxRounds,
        s"kCoreness: $maxRounds peel rounds exhausted at k=$k — " +
          "pathologically deep cascade (long-path graph) or maxRounds too small")
      val deg = e.select(col("src").as("v"))
        .union(e.select(col("dst").as("v")))
        .groupBy("v").agg(count(lit(1)).as("__deg"))
      val peel = remaining.join(deg, Seq("v"), "left")
        .filter(coalesce(col("__deg"), lit(0L)) < k)
        .select("v").localCheckpoint()
      if (peel.isEmpty) {
        k += 1
        require(k <= maxK,
          s"kCoreness: coreness exceeds maxK=$maxK — raise the bound")
      } else {
        peels += peel.withColumn("coreness", lit((k - 1).toLong))
        remaining = remaining.join(peel, Seq("v"), "left_anti").localCheckpoint()
        e = e
          .join(peel.select(col("v").as("src")), Seq("src"), "left_anti")
          .join(peel.select(col("v").as("dst")), Seq("dst"), "left_anti")
          .localCheckpoint()
      }
    }
    if (peels.isEmpty)
      spark.range(0).select(col("id").as("v"), col("id").as("coreness"))
    else peels.reduce(_ unionByName _)
  }

  /** Driver peeling twin (Matula & Beck 1983's phase formulation): the
    * same k = 1, 2, … cascade semantics over a collected adjacency map.
    * Coreness is graph-invariant, so the result is identical to the
    * distributed path's by definition, not by matched iteration order. */
  private def kCorenessLocal(spark: org.apache.spark.sql.SparkSession,
                             rows: Array[org.apache.spark.sql.Row],
                             maxK: Int): DataFrame = {
    import spark.implicits._
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    rows.foreach { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      adj.getOrElseUpdate(s, scala.collection.mutable.Set.empty) += d
      adj.getOrElseUpdate(d, scala.collection.mutable.Set.empty) += s
    }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 1
    while (adj.nonEmpty) {
      require(k <= maxK, s"kCoreness: coreness exceeds maxK=$maxK — raise the bound")
      val queue = scala.collection.mutable.Queue.empty[Long]
      adj.foreach { case (v, ns) => if (ns.size < k) queue += v }
      if (queue.isEmpty) k += 1
      else while (queue.nonEmpty) {
        val v = queue.dequeue()
        adj.remove(v).foreach { ns =>
          core(v) = (k - 1).toLong
          ns.foreach { u =>
            adj.get(u).foreach { un =>
              un -= v
              if (un.size == k - 1) queue += u // just dropped below k
            }
          }
        }
      }
    }
    core.toSeq.toDF("v", "coreness")
  }

  /**
   * Link prediction over an undirected graph: for every NON-edge pair
   * (u, v) sharing at least one neighbor, the two classic proximity
   * scores — common-neighbor count CN(u,v) = |Γ(u) ∩ Γ(v)| and the
   * resource-allocation index RA(u,v) = Σ_{w ∈ Γ(u)∩Γ(v)} 1/deg(w)
   * (Zhou, Lü & Zhang, EPJ B 2009 — RA consistently beats Adamic-Adar
   * on dense graphs). The standard crawl/citation-graph "suggest missing
   * links / find near-miss duplicates" primitive.
   *
   * Engine-portable by construction: CN is an exact count and RA is kept
   * in FIXED-POINT integer units of 1e-12 (Σ 10^12 div deg(w), integer
   * division) — no float folds, so the whole result hash-checks.
   *
   * Scale shape: wedges are generated per CENTER vertex w from its
   * adjacency list — one groupBy(w) collecting neighbors (bounded by
   * max degree), one ordered-pair explode, one count/sum agg on (u, v),
   * one anti-join against the edge set. Work is Σ_w deg(w)², the
   * triangle-counting budget; `maxDegree` LOUD-fails on a hub that would
   * make a single list pathological (salt or sample hubs upstream — a
   * silent cap would bias the scores).
   */
  def linkPrediction(edges: DataFrame, maxDegree: Int = 10000): DataFrame = {
    val e = canonicalEdges(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))).localCheckpoint()
    // both directions: Γ(w) per center w
    val adj = e.select(col("src").as("w"), col("dst").as("v"))
      .unionByName(e.select(col("dst").as("w"), col("src").as("v")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("__deg"))
    val hub = deg.filter(col("__deg") > maxDegree).limit(1).collect()
    require(hub.isEmpty,
      s"linkPrediction: vertex ${hub.headOption.map(_.get(0)).orNull} has degree " +
        s"> maxDegree=$maxDegree — wedge fanout would be quadratic in it; " +
        "salt/sample hub adjacencies upstream or raise the bound")
    // per-center ordered neighbor pairs, RA contribution in 1e-12 units
    val wedges = adj.join(deg, "w")
      .groupBy(col("w"), col("__deg"))
      .agg(sort_array(collect_list(col("v"))).as("__ns"))
      .select(expr("1000000000000L div __deg").as("__ra"),
        explode(expr(
          "flatten(transform(__ns, a -> transform(filter(__ns, b -> b > a), " +
            "b -> struct(a, b))))")).as("__p"))
      .select(col("__p.a").as("u"), col("__p.b").as("v"), col("__ra"))
    wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("cn"), sum(col("__ra")).as("ra_e12"))
      .join(e.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_anti")
  }
}
