package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  /** Brute-force union-find reference for small graphs. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress to the true min root (union by min above keeps min roots)
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  /** Run BOTH execution paths: localThreshold=0 forces the distributed
    * large-star/small-star rounds, the default engages the driver
    * union-find fast path. They must agree exactly. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val local = ConnectedComponents.labels(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.labels(df, "a", "b", localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"fast path diverged from distributed: " +
      s"onlyLocal=${local.toSet -- dist.toSet} onlyDist=${dist.toSet -- local.toSet}")
    local
  }

  test("two triangles joined by a bridge, plus an isolated pair") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L), (10L, 11L))
    val got = run(edges)
    assert(got == ufLabels(edges))
    assert((1 to 6).forall(i => got(i.toLong) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
  }

  test("long path converges in few rounds (the log² contract)") {
    // a 400-node path: naive min propagation needs ~400 rounds; the
    // large-star/small-star default budget of 25 must be plenty
    val edges = (0L until 399L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == 400 && got.values.forall(_ == 0L))
  }

  test("self-loops, duplicate and reversed edges are tolerated") {
    val edges = Seq((7L, 7L), (3L, 9L), (9L, 3L), (3L, 9L), (9L, 12L))
    val got = run(edges)
    assert(got(3L) == 3L && got(9L) == 3L && got(12L) == 3L)
    // 7's only edge is a self-loop: it carries no connectivity information
    // and the node is dropped with it (same as the recursive-closure oracle)
    assert(!got.contains(7L))
  }

  test("randomized graphs match union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == ufLabels(edges))
    }
  }

  test("probe boundary: exactly-threshold graphs go local, +1 goes distributed") {
    val edges = (0L until 10L).map(i => (i, i + 1)) // 10 deduped edges
    val atThreshold = ConnectedComponents.labels(
        edges.toDF("a", "b"), "a", "b", localThreshold = 10)
      .as[(Long, Long)].collect().toMap
    val justBelow = ConnectedComponents.labels(
        edges.toDF("a", "b"), "a", "b", localThreshold = 9)
      .as[(Long, Long)].collect().toMap
    assert(atThreshold == justBelow)
    assert(atThreshold.size == 11 && atThreshold.values.forall(_ == 0L))
  }

  test("keepRepresentatives drops every non-min cluster member") {
    val docs = (1L to 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents.keepRepresentatives(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 7L, 8L))
  }
}
