package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Correlated, anisotropic vectors — the regime where plain PQ's
    * axis-aligned subspace split is provably suboptimal: energy concentrated
    * in a few directions that straddle subspace boundaries. */
  private def corpus = {
    val rng = new scala.util.Random(7)
    val basis = Array.fill(dim, dim)(rng.nextGaussian())
    (0 until 600).map { i =>
      val z = Array.tabulate(4)(_ => rng.nextGaussian()) // rank-4 signal
      val v = Array.tabulate(dim) { d =>
        var s = 0.0
        var j = 0
        while (j < 4) { s += basis(j)(d) * z(j) * (4 - j); j += 1 }
        (s + 0.01 * rng.nextGaussian()).toFloat
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("OPQ rotation is orthogonal and lowers quantization error vs plain PQ") {
    val df = corpus.cache()
    val sample = df.select("embedding").limit(600).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val m = 4; val k = 8
    val pq = Quantization.train(df, dim, m, k, sampleSize = 600)
    val identity = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val pqErr = Opq.reconstructionError(sample, Opq.OpqModel(identity, pq))
    val opq = Opq.train(df, dim, m, k, sampleSize = 600)
    // R orthogonal: R Rt = I
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(t => opq.rotation(i)(t) * opq.rotation(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRt($i,$j)=$dot")
    }
    val opqErr = Opq.reconstructionError(sample, opq)
    assert(opqErr < pqErr * 0.9,
      s"OPQ must cut quantization error on correlated data: pq=$pqErr opq=$opqErr")
  }

  test("OPQ ADC top-k beats plain-PQ recall against exact L2 on correlated data") {
    val df = corpus.cache()
    val queries = df.filter(col("vec_id") < 8)
    val m = 4; val k = 8; val topk = 10
    // exact L2 ground truth on the collected vectors
    val vecs = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 8L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(topk).map(q -> _)
    }.toSet
    def recallOf(result: org.apache.spark.sql.DataFrame): Double = {
      val got = result.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val pq = Quantization.train(df, dim, m, k, sampleSize = 600)
    val pqRes = Quantization.adcTopK(Quantization.encode(df, pq), queries, pq, k = topk)
    val opq = Opq.train(df, dim, m, k, sampleSize = 600)
    val rotated = Opq.rotate(df, opq.rotation, outCol = "rotated")
    val opqRes = Opq.adcTopK(
      Quantization.encode(rotated, opq.pq, vecCol = "rotated"), queries, opq, k = topk)
    val (rPq, rOpq) = (recallOf(pqRes), recallOf(opqRes))
    assert(rOpq >= rPq - 0.05, s"OPQ recall $rOpq should not trail PQ recall $rPq")
    assert(rOpq >= 0.5, s"OPQ recall too low: $rOpq")
  }

  test("OPQ-IVFADC: rotated residuals keep recall through cell pruning") {
    val df = corpus.cache()
    val queries = df.filter(col("vec_id") < 8)
    val topk = 10
    val vecs = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 8L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(topk).map(q -> _)
    }.toSet
    val centroids = Similarity.ivfIndex(df, dim = dim, k = 8, sampleSize = 600)
    val withRes = Quantization.residuals(
      Similarity.assignCells(df, centroids), centroids)
    // rotate the RESIDUALS (cell geometry stays in the original space)
    val opq = Opq.train(withRes, dim, m = 4, k = 8, sampleSize = 600, vecCol = "residual")
    val rotated = Opq.rotate(withRes, opq.rotation, vecCol = "residual", outCol = "rotres")
    val encoded = Quantization.encode(rotated, opq.pq, vecCol = "rotres")
    val got = Quantization.ivfPqTopK(encoded, queries, centroids, opq.pq,
        k = topk, nprobe = 4, residual = true, rotation = Some(opq.rotation))
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.5, s"OPQ-IVFADC recall@$topk $recall")
  }
}
