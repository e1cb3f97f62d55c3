package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  test("lloyd: hand-computed 1-D two-cluster case") {
    // init = two lowest ids: c0 = 0.0, c1 = 1.0. Round 1: {0, 0.2} -> c0,
    // {1.0, 1.2, 10.0} -> c1; centroids move to 0.1 and (1.0+1.2+10.0)/3 ≈
    // 4.07. Round 2: the moved c1 is so far right that 1.0 and 1.2 now
    // fall to c0 — counts (4, 1), centroids 0.6 (id-ordered fold) and 10.
    val df = Seq(
      (1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(0.2f)),
      (4L, Seq(1.2f)), (5L, Seq(10.0f))
    ).toDF("vec_id", "embedding")
    val byCluster = Clustering.lloyd(df, "vec_id", "embedding", k = 2,
        iterations = 2, orderedFold = true)
      .select("cluster", "n", "centroid", "inertia")
      .as[(Int, Long, Seq[Double], Double)].collect().sortBy(_._1)
    assert(byCluster.map(_._2).toSeq == Seq(4L, 1L))
    // expectation folds the WIDENED float32 values, like the operator does
    assert(byCluster(0)._3.head == (((0.0 + 1.0) + 0.2f.toDouble) + 1.2f.toDouble) / 4)
    assert(byCluster(1)._3.head == 10.0)
    assert(byCluster(1)._4 == 0.0) // singleton cluster: zero inertia
  }

  test("lloyd: ordered and unordered folds agree within float tolerance") {
    val df = (1L to 200L).map { i =>
      (i, Seq.tabulate(8)(j => (math.sin(i * (j + 1) * 0.1)).toFloat))
    }.toDF("vec_id", "embedding")
    val a = Clustering.lloyd(df, "vec_id", "embedding", k = 3, iterations = 3,
      orderedFold = true).select("cluster", "n", "inertia")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    val b = Clustering.lloyd(df, "vec_id", "embedding", k = 3, iterations = 3,
      orderedFold = false).select("cluster", "n", "inertia")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(a.map(t => (t._1, t._2)).toSeq == b.map(t => (t._1, t._2)).toSeq,
      "assignments must not depend on the fold mode")
    a.zip(b).foreach { case ((_, _, ia), (_, _, ib)) =>
      assert(math.abs(ia - ib) <= 1e-9 * math.max(1.0, math.abs(ia)))
    }
  }

  test("lloyd: an empty cluster keeps its previous centroid and can recover members") {
    // all three init centroids coincide at 0.0 (ids 1-3 are identical), so
    // round 1 ties EVERYTHING (including 8.0) into c0, emptying c1/c2 —
    // which must keep their 0.0 centroids. c0's mean moves to 2.0, so in
    // round 2 the zeros tie back to the RETAINED c1 (0 < 4, lower id wins
    // over c2) and 8.0 stays with c0 (36 < 64): the retained centroid
    // recovered the members that the moved one lost.
    val df = Seq(
      (1L, Seq(0.0f)), (2L, Seq(0.0f)), (3L, Seq(0.0f)), (4L, Seq(8.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.lloyd(df, "vec_id", "embedding", k = 3,
        iterations = 2, orderedFold = true)
      .select("cluster", "n", "centroid")
      .as[(Int, Long, Seq[Double])].collect().sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((0, 1L), (1, 3L)))
    assert(out.find(_._1 == 0).get._3.head == 8.0)
    assert(out.find(_._1 == 1).get._3.head == 0.0)
  }
}
