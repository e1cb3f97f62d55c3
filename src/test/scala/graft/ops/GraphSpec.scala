package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("src", "dst"))
      .as[Long].head()

  /** brute force over the canonical undirected edge set */
  private def brute(edges: Seq[(Long, Long)]): Long = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    vs.combinations(3).count { case Seq(a, b, c) =>
      e((a, b)) && e((b, c)) && e((a, c))
    }
  }

  test("kCoreness: cliques, bridge, cascading path, brute-force cross-check") {
    // K4 (1-4) -- bridge -- K3 (5-7), with a path 7-8-9-10 hanging off K3
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L),                                                  // bridge
      (5L, 6L), (5L, 7L), (6L, 7L),                              // K3
      (7L, 8L), (8L, 9L), (9L, 10L))                             // path
    val got = Graph.kCoreness(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // the bridge raises degree but NOT coreness; the path cascades out at
    // phase 2 from the far end
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 1L, 9L -> 1L, 10L -> 1L), got)

    // brute-force cross-check on a pseudo-random sparse graph: coreness(v)
    // = max k with v in the iteratively-trimmed k-core
    val rnd = (0 until 120).map { i =>
      val a = (i * 37 + 11) % 30; val b = (i * i * 13 + 7) % 30
      (a.toLong, b.toLong)
    }.filter(p => p._1 != p._2)
    def bruteCore(es: Set[(Long, Long)]): Map[Long, Long] = {
      val adj0 = es.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
        .map { case (v, ps) => v -> ps.map(_._2) }
      val core = scala.collection.mutable.Map.empty[Long, Long]
      var alive = adj0.keySet
      var k = 1L
      while (alive.nonEmpty) {
        var changed = true
        while (changed) {
          val drop = alive.filter(v => adj0(v).count(alive) < k)
          changed = drop.nonEmpty
          drop.foreach { v => core(v) = k - 1 }
          alive = alive -- drop
        }
        k += 1
      }
      core.toMap
    }
    val canonical = rnd.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val expected = bruteCore(canonical)
    val got2 = Graph.kCoreness(rnd.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got2 == expected, s"diff: ${got2.toSet diff expected.toSet}")
  }

  test("triangleCount: known small graphs") {
    // one triangle
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == 1L)
    // square (no triangle)
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == 0L)
    // K4 has 4 triangles; duplicate/reversed/self edges must not change it
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4 ++ k4.map(_.swap) ++ Seq((2L, 2L))) == 4L)
  }

  test("triangleCount matches brute force on a pseudo-random sparse graph") {
    val n = 60L
    val edges = (1L to n).flatMap { p =>
      Seq((p, (p * 31 + 7) % n + 1), (p, (p * 17 + 3) % n + 1), (p, (p * 13 + 11) % n + 1))
    }
    assert(count(edges) == brute(edges))
  }

  test("pageRank: hand-computed two-node exchange; mass conservation; fold paths agree") {
    // 1 <-> 2: symmetric, so ranks stay at 1/2 every round
    val sym = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        iterations = 3, orderedFold = true)
      .as[(Long, Double)].collect().toMap
    assert(sym(1L) == 0.5 && sym(2L) == 0.5)

    // no dangling nodes -> total rank mass stays 1 (up to float error)
    val n = 40L
    val edges = (1L to n).flatMap { p =>
      Seq((p, (p * 31 + 7) % n + 1), (p, (p * 17 + 3) % n + 1))
    }.filter(e => e._1 != e._2)
    // every vertex 1..n has an out-edge in this construction
    val df = edges.toDF("src", "dst")
    val ranks = Graph.pageRank(df, iterations = 5).as[(Long, Double)].collect()
    assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-9)
    // ordered fold is the same algorithm, just a fixed fold order
    val ordered = Graph.pageRank(df, iterations = 5, orderedFold = true)
      .as[(Long, Double)].collect().toMap
    ranks.foreach { case (v, r) => assert(math.abs(r - ordered(v)) < 1e-12) }
    // the driver fast path and the DISTRIBUTED ordered fold must agree to
    // the BIT (localThreshold = 0 forces the distributed rounds)
    val distributed = Graph.pageRank(df, iterations = 5, orderedFold = true,
      localThreshold = 0).as[(Long, Double)].collect().toMap
    ordered.foreach { case (v, r) =>
      assert(java.lang.Double.doubleToLongBits(r) ==
        java.lang.Double.doubleToLongBits(distributed(v)),
        s"vertex $v: local $r != distributed ${distributed(v)}")
    }

    // sink drops mass: 1 -> 2 with 2 dangling loses 2's mass each round
    val sink = Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"),
      iterations = 1, orderedFold = true).as[(Long, Double)].collect().toMap
    // r1(1) = 0.15/2 (no inbound); r1(2) = 0.15/2 + 0.85 * 0.5
    assert(sink(1L) == (1.0 - 0.85) / 2)
    assert(sink(2L) == (1.0 - 0.85) / 2 + 0.85 * 0.5)
  }

  test("bfsDistances: hand-computed chain + diamond, multi-source, depth cap") {
    // 1->2->3->4->5 chain plus shortcut 1->4; source {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
    val got = Graph.bfsDistances(edges.toDF("src", "dst"), Seq(1L).toDF("v"),
        maxDepth = 10)
      .orderBy("v").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 1), (5L, 2)))
    // multi-source: min over sources; vertex 6 unreachable -> absent
    val got2 = Graph.bfsDistances(
        (edges :+ ((6L, 1L))).toDF("src", "dst"),
        Seq(1L, 3L).toDF("v"), maxDepth = 10)
      .orderBy("v").as[(Long, Int)].collect().toSeq
    assert(got2 == Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1), (5L, 2)))
    // depth cap: nothing beyond 1 hop
    val capped = Graph.bfsDistances(edges.toDF("src", "dst"),
        Seq(1L).toDF("v"), maxDepth = 1)
      .orderBy("v").as[(Long, Int)].collect().toSeq
    assert(capped == Seq((1L, 0), (2L, 1), (4L, 1)))
  }

  test("bfsDistances: distributed path is identical to the driver path") {
    val n = 80L
    val edges = (1L to n).flatMap { p =>
      Seq((p, (p * 31 + 7) % n + 1), (p, (p * 17 + 3) % n + 1))
    }
    val srcs = Seq(1L, 2L).toDF("v")
    val local = Graph.bfsDistances(edges.toDF("src", "dst"), srcs, maxDepth = 8)
      .orderBy("v").as[(Long, Int)].collect().toSeq
    val dist = Graph.bfsDistances(edges.toDF("src", "dst"), srcs, maxDepth = 8,
        localThreshold = 0)
      .orderBy("v").as[(Long, Int)].collect().toSeq
    assert(local == dist && local.nonEmpty)
  }

  test("labelPropagation: two cliques joined by a bridge split into two communities") {
    // K4 on {1..4} + K4 on {5..8} + bridge 4-5: LPA converges to the
    // min label of each clique; the bridge is not enough to merge them
    def k4(off: Long) = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .map { case (a, b) => (a + off, b + off) }
    val edges = k4(0) ++ k4(4) ++ Seq((4L, 5L))
    val labels = Graph.labelPropagation(edges.toDF("src", "dst"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert((1L to 4L).map(labels).toSet == Set(1L))
    assert((6L to 8L).map(labels).toSet == Set(5L))
  }

  test("labelPropagation: hand-computed one round on a path graph") {
    // path 1-2-3: round 1 is pure neighbour-min adoption
    // v=1 sees {2}; v=2 sees {1,3} -> tie, min = 1; v=3 sees {2}
    val labels = Graph.labelPropagation(
        Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("labelPropagation: distributed path is identical to the driver path") {
    val n = 60L
    val edges = (1L to n).flatMap { p =>
      Seq((p, (p * 31 + 7) % n + 1), (p, (p * 17 + 3) % n + 1))
    }
    val local = Graph.labelPropagation(edges.toDF("src", "dst"), rounds = 3)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    val dist = Graph.labelPropagation(edges.toDF("src", "dst"), rounds = 3,
        localThreshold = 0)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(local == dist && local.nonEmpty)
  }

  test("shortestPaths: hand-computed weighted diamond incl. parallel-edge min") {
    // 1->2 (w=1), 1->3 (w=5), 2->3 (w=1), 3->4 (w=1), plus a worse
    // parallel 1->2 (w=9) that must lose to the cheaper one
    val e = Seq((1L, 2L, 1L), (1L, 2L, 9L), (1L, 3L, 5L), (2L, 3L, 1L), (3L, 4L, 1L))
    val d = Graph.shortestPaths(e.toDF("src", "dst", "w"),
        Seq(1L).toDF("v"), maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("shortestPaths: round cap truncates long cheap paths") {
    // chain 1->2->3->4 all w=1, and a direct expensive 1->4 (w=100):
    // with maxRounds=2 the 3-hop path is not yet relaxed
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 100L))
    val capped = Graph.shortestPaths(e.toDF("src", "dst", "w"),
        Seq(1L).toDF("v"), maxRounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped(4L) == 100L)
    val full = Graph.shortestPaths(e.toDF("src", "dst", "w"),
        Seq(1L).toDF("v"), maxRounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(full(4L) == 3L)
  }

  test("shortestPaths: distributed path is identical to the driver path") {
    val n = 70L
    val edges = (1L to n).flatMap { p =>
      Seq((p, (p * 31 + 7) % n + 1, (p * 7) % 20 + 1),
        (p, (p * 17 + 3) % n + 1, (p * 3) % 20 + 1))
    }
    val srcs = Seq(1L, 2L).toDF("v")
    val local = Graph.shortestPaths(edges.toDF("src", "dst", "w"), srcs, maxRounds = 12)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    val dist = Graph.shortestPaths(edges.toDF("src", "dst", "w"), srcs, maxRounds = 12,
        localThreshold = 0)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(local == dist && local.nonEmpty)
  }

  test("modularity: hand-computed two-triangle graph; whole-graph community scores 0") {
    // two triangles {1,2,3} and {4,5,6} + bridge 3-4: m=7, per community
    // l_c=3, D_c=7 -> Q = 2*(3/7 - (7/14)^2) = 5/14 = 70/196
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("v", "label")
    val q = Graph.modularity(edges, labels)
      .as[(Long, Long, Long, Long)].head()
    assert(q == ((7L, 2L, 70L, 196L)))

    // everything in ONE community: Q = m/m - 1 = 0 exactly
    val one = labels.withColumn("label", lit(1L))
    val q1 = Graph.modularity(edges, one).as[(Long, Long, Long, Long)].head()
    assert(q1 == ((7L, 1L, 0L, 196L)))
  }

  test("scc: hand-computed digraph — cycles, bridge, acyclic tail, self-loop singleton") {
    // {1,2,3} cycle; bridge 3->4; {4,5} 2-cycle; acyclic tail 5->6->7;
    // back-edge 7->6 makes {6,7} strong; 8->1 feeds the first SCC;
    // 9 has ONLY a self-loop — a legitimate singleton SCC that must not
    // vanish with its filtered edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 4L), (5L, 6L), (6L, 7L), (7L, 6L), (8L, 1L), (9L, 9L))
      .toDF("src", "dst")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 6L, 8L -> 8L, 9L -> 9L)
    val got = Graph.stronglyConnectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == expect, s"got $got")
    val dist = Graph.stronglyConnectedComponents(edges, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == expect, s"distributed path: $dist")
  }

  test("scc: a pure DAG resolves entirely in the trim phase (distributed path)") {
    // binary tree + a chain — no cycles at all, so every vertex is a
    // singleton SCC and the distributed path must settle without ever
    // entering the coloring fixpoint (outer round 1, trim only)
    val tree = (2L to 15L).map(v => (v / 2, v))
    val chain = (20L to 24L).map(v => (v, v + 1))
    val edges = (tree ++ chain).toDF("src", "dst")
    val got = Graph.stronglyConnectedComponents(edges, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    val verts = (1L to 15L) ++ (20L to 25L)
    assert(got == verts.map(v => v -> v).toMap, s"got $got")
  }

  test("scc: distributed coloring/FW-BW path is identical to the driver Tarjan path") {
    // pseudo-random digraph with planted cycles: 3 blocks of 6 vertices
    // each forming a cycle, chained bridges, plus deterministic extra
    // edges that stay within the condensation order
    val blocks = (0 until 3).flatMap { b =>
      val base = b * 6 + 1
      (0 until 6).map(i => (base + i.toLong, base + ((i + 1) % 6).toLong))
    }
    val bridges = Seq((6L, 7L), (12L, 13L))
    val extra = Seq((2L, 9L), (3L, 14L), (8L, 15L)) // forward only
    val edges = (blocks ++ bridges ++ extra).toDF("src", "dst")
    val local = Graph.stronglyConnectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.stronglyConnectedComponents(edges, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == (1L to 18L).map(v => v -> (((v - 1) / 6) * 6 + 1)).toMap)
    assert(dist == local, s"distributed=$dist local=$local")
  }

  test("kCoreness: driver peel path is identical to the distributed peel") {
    // K4 + bridge + K3 + path (the hand-checked fixture) — coreness is
    // graph-invariant, so the two paths must agree exactly
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L),
      (7L, 8L), (8L, 9L), (9L, 10L))
    val local = Graph.kCoreness(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val dist = Graph.kCoreness(edges.toDF("src", "dst"), localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"local=$local dist=$dist")
    assert(local(1L) == 3L && local(5L) == 2L && local(10L) == 1L)
  }

  test("linkPrediction: CN and fixed-point RA on a hand-checked graph") {
    // path 1-2-3 plus triangle 3-4-5 plus pendant 5-6:
    //   non-edge (1,3): common neighbor {2}, deg(2)=2 -> cn=1, ra=5e11
    //   non-edge (2,4): {3}, deg(3)=3 -> cn=1, ra=333333333333
    //   non-edge (2,5): {3}           -> cn=1, ra=333333333333
    //   non-edge (4,6): {5}, deg(5)=3 -> cn=1, ra=333333333333
    //   non-edge (3,6): {5}           -> cn=1, ra=333333333333
    //   non-edge (1,4)/(1,5)/(1,6)/(2,6): no common neighbor -> absent
    //   edges (4,5),(3,4),(3,5): share a neighbor but are EDGES -> screened
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L), (5L, 6L))
    val got = Graph.linkPrediction(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 1L, 500000000000L),
      (2L, 4L, 1L, 333333333333L),
      (2L, 5L, 1L, 333333333333L),
      (3L, 6L, 1L, 333333333333L),
      (4L, 6L, 1L, 333333333333L)), s"got $got")
  }

  test("linkPrediction: hub over maxDegree loud-fails") {
    val star = (2L to 12L).map(v => (1L, v))
    val ex = intercept[IllegalArgumentException] {
      Graph.linkPrediction(star.toDF("src", "dst"), maxDegree = 10).count()
    }
    assert(ex.getMessage.contains("maxDegree"))
  }

  test("triangleCount: hub vertex generates no wedges (degree orientation)") {
    // star K1,50 plus one triangle through the hub: the hub's degree is 51,
    // so both hub edges of the triangle orient AWAY from the leaves
    val star = (2L to 51L).map(v => (1L, v))
    val edges = star ++ Seq((2L, 3L))
    assert(count(edges) == 1L)
    assert(brute(edges) == 1L)
  }
}
