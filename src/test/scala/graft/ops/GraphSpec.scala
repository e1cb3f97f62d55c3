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

  test("triangleCount: hub vertex generates no wedges (degree orientation)") {
    // star K1,50 plus one triangle through the hub: the hub's degree is 51,
    // so both hub edges of the triangle orient AWAY from the leaves
    val star = (2L to 51L).map(v => (1L, v))
    val edges = star ++ Seq((2L, 3L))
    assert(count(edges) == 1L)
    assert(brute(edges) == 1L)
  }
}
