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

  test("triangleCount: hub vertex generates no wedges (degree orientation)") {
    // star K1,50 plus one triangle through the hub: the hub's degree is 51,
    // so both hub edges of the triangle orient AWAY from the leaves
    val star = (2L to 51L).map(v => (1L, v))
    val edges = star ++ Seq((2L, 3L))
    assert(count(edges) == 1L)
    assert(brute(edges) == 1L)
  }
}
