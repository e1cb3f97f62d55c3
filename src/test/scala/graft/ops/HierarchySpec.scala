package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {

  import spark.implicits._

  test("subtreeSum: hand-computed forest with two roots and uneven depth") {
    //        1            10
    //       / \            |
    //      2   3          11
    //     / \
    //    4   5
    //    |
    //    6
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 4L),
      (11L, 10L)).toDF("child", "parent")
    val values = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L)
      .toDF("v").withColumn("value", $"v" * 10)
    val got = Hierarchy.subtreeSum(edges, values)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 210L, // 10+20+30+40+50+60
      2L -> 170L, 3L -> 30L, 4L -> 100L, 5L -> 50L, 6L -> 60L,
      10L -> 210L, 11L -> 110L), s"got $got")
  }

  test("subtreeSum: matches brute-force descendant sums on a pseudo-random forest") {
    val rnd = new scala.util.Random(17)
    // node k's parent is a random smaller id (acyclic by construction)
    val parents = (2L to 120L).map(k => k -> (rnd.nextInt((k - 1).toInt) + 1).toLong)
    val edges = parents.toDF("child", "parent")
    val values = (1L to 120L).toDF("v").withColumn("value", $"v" * $"v")
    val got = Hierarchy.subtreeSum(edges, values)
      .as[(Long, Long)].collect().toMap
    // brute force: walk each node's ancestor chain, adding its value
    val pMap = parents.toMap
    val expect = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    (1L to 120L).foreach { k =>
      var cur = Option(k)
      while (cur.isDefined) {
        expect(cur.get) += k * k
        cur = pMap.get(cur.get)
      }
    }
    assert(got == expect.toMap, s"diff: ${got.toSet diff expect.toSet}")
  }

  test("depthAndRoot: two-root forest resolves roots and depths; cycle loud-fails") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (6L, 4L), (11L, 10L))
      .toDF("child", "parent")
    val nodes = Seq(1L, 2L, 3L, 4L, 6L, 10L, 11L).toDF("v")
    val got = Hierarchy.depthAndRoot(edges, nodes)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((1L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 1L)),
      4L -> ((1L, 2L)), 6L -> ((1L, 3L)),
      10L -> ((10L, 0L)), 11L -> ((10L, 1L))), s"got $got")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.depthAndRoot(
        Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("child", "parent"),
        Seq(1L, 2L, 3L).toDF("v"), maxDepth = 8)
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("subtreeSum: an edge to a parent outside the node set yields no phantom output row") {
    // parent 99 is not in `values`: node 2's mass still flows through it
    // (to nothing — 99 has no outgoing edge), but the OUTPUT must stay
    // one row per declared node
    val edges = Seq((2L, 99L)).toDF("child", "parent")
    val values = Seq(2L, 3L).toDF("v").withColumn("value", $"v")
    val got = Hierarchy.subtreeSum(edges, values)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 3L -> 3L), s"got $got")
  }

  test("subtreeSum: a cycle loud-fails instead of looping or silently dropping mass") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("child", "parent")
    val values = Seq(1L, 2L, 3L).toDF("v").withColumn("value", lit(1L))
    val e = intercept[IllegalArgumentException] {
      Hierarchy.subtreeSum(edges, values, maxDepth = 8)
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  // r13: the bounded-probe driver path (localThreshold) must be row-for-row
  // interchangeable with the distributed rounds — localThreshold = 0 forces
  // the distributed path on the same input, including DAG fan-out (a child
  // with TWO parents) and an all-null mass node (SQL SUM null semantics).
  test("subtreeSum: driver path ≡ distributed path, incl. DAG fan-out and null mass") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (4L, 3L), (5L, 4L))
      .toDF("child", "parent")
    val values = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)),
        (4L, None: Option[Long]), (5L, Some(50L)))
      .toDF("v", "value")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).sortBy(_._1).toSeq
    val local = canon(Hierarchy.subtreeSum(edges, values))
    val dist = canon(Hierarchy.subtreeSum(edges, values, localThreshold = 0))
    assert(local == dist, s"local=$local dist=$dist")
    // DAG fan-out: node 5's mass reaches 1 via BOTH parents of 4
    assert(local.toMap.apply(1L) == 10L + 20L + 30L + 2 * 50L)
  }

  test("depthAndRoot: driver path ≡ distributed path, incl. multi-parent rows") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (4L, 3L), (11L, 10L))
      .toDF("child", "parent")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L).toDF("v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val local = canon(Hierarchy.depthAndRoot(edges, nodes))
    val dist = canon(Hierarchy.depthAndRoot(edges, nodes, localThreshold = 0))
    assert(local == dist, s"local=$local dist=$dist")
    // node 4 has two resolved parents -> TWO rows, one per path
    assert(local.count(_._1 == 4L) == 2)
  }
}
