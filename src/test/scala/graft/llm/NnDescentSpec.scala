package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NnDescentSpec extends SparkSpec {

  import spark.implicits._

  /** clustered fixture: `n` points in 4 gaussian clusters, dim 16. */
  private def fixture(n: Int, seed: Int = 7) = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(4, 16)(rng.nextGaussian() * 3)
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.4).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select($"vec_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("converges to the exact brute-force kNN graph on a clustered corpus") {
    val vecs = fixture(200).localCheckpoint()
    val got = NnDescent.knnGraph(vecs, k = 5, iterations = 4)
      .select($"vec_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().sorted
    val want = Similarity.bruteForceTopK(vecs, vecs, k = 5)
      .select($"query_id".as("vec_id"), $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().sorted
    assert(got.length == want.length, s"${got.length} vs ${want.length} rows")
    assert(got.sameElements(want),
      "NN-Descent at 4 iterations must converge exactly on this corpus")
  }

  test("recall floor at weak settings; three iterations nearly exact") {
    val vecs = fixture(300, seed = 11).localCheckpoint()
    val exact = asSet(Similarity.bruteForceTopK(vecs, vecs, k = 5)
      .withColumnRenamed("query_id", "vec_id"))
    def recallAt(iters: Int): Double = {
      val approx = asSet(NnDescent.knnGraph(vecs, k = 5, iterations = iters))
      val r = exact.map { case (q, t) =>
        t.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / t.size
      }
      r.sum / r.size
    }
    val r1 = recallAt(1)
    assert(r1 >= 0.85, s"1-iteration recall too low: $r1")
    val r3 = recallAt(3)
    assert(r3 >= 0.95, s"3-iteration recall too low: $r3")
  }

  test("deterministic: two runs produce identical graphs") {
    val vecs = fixture(120, seed = 3).localCheckpoint()
    val a = NnDescent.knnGraph(vecs, k = 4, iterations = 2)
      .select($"vec_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().sorted
    val b = NnDescent.knnGraph(vecs, k = 4, iterations = 2)
      .select($"vec_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().sorted
    assert(a.sameElements(b))
  }

  test("bounds: k rows per id, ranks dense from 1, degree cap enforced") {
    val vecs = fixture(150, seed = 5).localCheckpoint()
    val g = NnDescent.knnGraph(vecs, k = 3, iterations = 2)
    val perId = g.groupBy("vec_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi")).collect()
    perId.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(2) == 1 &&
        r.getInt(3) == r.getLong(1).toInt)
    }
    intercept[IllegalArgumentException] {
      NnDescent.knnGraph(vecs, k = 5, iterations = 1, maxPivotDegree = 6)
    }
  }

  test("degenerate inputs: empty corpus and zero-norm vectors") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(NnDescent.knnGraph(empty, k = 3, iterations = 1).count() == 0)
    val withZero = fixture(50, seed = 9)
      .unionByName(Seq((999L, Seq.fill(16)(0f))).toDF("vec_id", "embedding"))
    val g = NnDescent.knnGraph(withZero, k = 3, iterations = 1)
    // the zero vector is excluded (no defined cosine), everyone else fine
    assert(g.filter($"vec_id" === 999L || $"neighbor_id" === 999L).count() == 0)
    assert(g.count() > 0)
  }
}
