package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("PQ: m-byte codes, model round-trip, and ADC recall vs exact L2 on clustered data") {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(5)(Array.fill(32)(rng.nextGaussian() * 3))
    val data = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }
    val corpus = data.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)

    val model = Quantization.train(corpus, dim = 32, m = 16, k = 32)
    val tmp = java.nio.file.Files.createTempDirectory("pq_spec").toString
    Quantization.saveModel(spark, model, s"$tmp/model")
    val loaded = Quantization.loadModel(spark, s"$tmp/model")
    assert(loaded.dim == 32 && loaded.m == 16 && loaded.k == 32)
    assert(loaded.codebooks.zip(model.codebooks).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })

    val encoded = Quantization.encode(corpus, loaded)
    val codeLens = encoded.select(length(col("pq_code"))).as[Int].collect()
    assert(codeLens.forall(_ == 16), s"code lengths: ${codeLens.distinct.mkString(",")}")

    val adc = Quantization.adcTopK(encoded, queries, loaded, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    // exact L2 ground truth on the collected vectors (200 rows)
    val vecs = data.toMap.view.mapValues(_.toArray.map(_.toDouble)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(5).map(q -> _)
    }.toSet

    val recall = (exact intersect adc).size.toDouble / exact.size
    assert(recall >= 0.6, s"ADC recall@5 $recall")

    // IVF-PQ composition: probed cells prune the corpus, codes score it —
    // recall must hold through both approximations
    val centroids = Similarity.ivfIndex(corpus, dim = 32, k = 8)
    val encodedCells = Quantization.encode(
      Similarity.assignCells(corpus, centroids), loaded)
    val ivfpq = Quantization.ivfPqTopK(encodedCells, queries, centroids, loaded,
        k = 5, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall2 = (exact intersect ivfpq).size.toDouble / exact.size
    assert(recall2 >= 0.6, s"IVF-PQ recall@5 $recall2")

    // residual IVF-PQ: same code budget quantizing v − centroid(cell)
    val withRes = Quantization.residuals(
      Similarity.assignCells(corpus, centroids), centroids)
    val resModel = Quantization.train(withRes, dim = 32, m = 16, k = 32,
      vecCol = "residual")
    val resEncoded = Quantization.encode(withRes, resModel, vecCol = "residual")
    val ivfpqRes = Quantization.ivfPqTopK(resEncoded, queries, centroids, resModel,
        k = 5, nprobe = 3, residual = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall3 = (exact intersect ivfpqRes).size.toDouble / exact.size
    assert(recall3 >= 0.6, s"residual IVF-PQ recall@5 $recall3 (absolute: $recall2)")
  }
}
