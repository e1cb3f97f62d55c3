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

  test("BQ: packing round-trips bit-exactly and the Hamming shortlist recalls exact cosine") {
    val rng = new scala.util.Random(17)
    // clustered, zero-centered data: sign bits carry the cluster identity
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian()))
    val data = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.2).toFloat).toSeq)
    }
    val corpus = data.toDF("vec_id", "embedding")

    // packing: the column expression must equal a reference Scala packer
    val got = corpus.select($"vec_id",
        Quantization.bqSignature($"embedding", 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    data.foreach { case (id, vec) =>
      val exp = (0 until 2).map { j =>
        (0 until 32).foldLeft(0L)((acc, b) =>
          if (vec(j * 32 + b) > 0f) acc | (1L << b) else acc)
      }
      assert(got(id) == exp, s"signature mismatch for vec $id")
    }

    // shortlist recall: Hamming CANNOT rank within a tight cluster (all
    // members share the sign pattern — distances tie at ~0), so the
    // honest contract is the shortlist-then-rerank one: a 10x shortlist
    // (top-50 of 200) must contain the exact cosine top-5. Hamming
    // separates the 4 clusters (~32 bits apart), so the shortlist is the
    // query's own 49-member cluster plus change.
    val queries = corpus.filter($"vec_id" < 10)
    val short = Quantization.bqTopK(corpus, queries, dim = 64, k = 50)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recall = exact.map { case (q, top5) =>
      top5.intersect(short.getOrElse(q, Set.empty)).size.toDouble / top5.size
    }
    val mean = recall.sum / recall.size
    assert(mean >= 0.9, s"BQ shortlist recall@5-in-50 too low: $mean")
    // and the shortlist is cluster-pure: Hamming separates the planted
    // clusters even though it can't rank inside them
    val purity = short.map { case (q, ids) =>
      ids.count(_ % 4 == q % 4).toDouble / ids.size
    }
    assert(purity.sum / purity.size >= 0.9,
      s"BQ shortlist cluster purity too low: ${purity.sum / purity.size}")

    // the query-side bound: the signature scan is corpus x |Q|, so a
    // query set past maxQueries must LOUD-fail, not silently broadcast
    val tooMany = intercept[IllegalArgumentException] {
      Quantization.bqTopK(corpus, corpus, dim = 64, k = 5, maxQueries = 100)
        .count()
    }
    assert(tooMany.getMessage.contains("maxQueries"), tooMany.getMessage)
    val rerankTooMany = intercept[IllegalArgumentException] {
      Quantization.bqRerankTopK(corpus, corpus, dim = 64,
        shortlist = 20, k = 5, maxQueries = 100).count()
    }
    assert(rerankTooMany.getMessage.contains("maxQueries"))
    // at the bound exactly, the scan runs
    assert(Quantization.bqTopK(corpus, queries, dim = 64, k = 5,
      maxQueries = 10).count() > 0)
  }

  test("SQ8: codes clamp to [0,255], constant dims encode 0, dequant error is bounded by one bin") {
    val rng = new scala.util.Random(7)
    val data = (0 until 100).map { i =>
      // dim 0 constant (span = 0), dim 1..7 random in [-3, 3]
      (i.toLong, (Seq(1.5f) ++ Seq.fill(7)((rng.nextDouble() * 6 - 3).toFloat)))
    }
    val corpus = data.toDF("vec_id", "embedding")
    val model = Quantization.sq8Train(corpus, dim = 8)
    assert(model.mins(0) == 1.5 && model.maxs(0) == 1.5)
    val enc = Quantization.sq8Encode(corpus, model)
      .select("vec_id", "codes").as[(Long, Array[Byte])].collect().toMap
    assert(enc.values.forall(_.length == 8))
    assert(enc.values.forall(_(0) == 0)) // constant dim -> code 0
    // dequantization error <= one bin width per dim
    data.foreach { case (id, v) =>
      val cs = enc(id)
      (0 until 8).foreach { i =>
        val span = model.maxs(i) - model.mins(i)
        val r = if (span == 0.0) model.mins(i)
                else model.mins(i) + ((cs(i) & 0xFF).toDouble * span) / 255.0
        assert(math.abs(v(i).toDouble - r) <= span / 255.0 + 1e-12,
          s"id=$id dim=$i v=${v(i)} r=$r span=$span")
      }
    }

    // top-k over codes approximates the exact ranking: the exact nearest
    // neighbour must appear in the SQ8 top-3 (a bin is span/255, far
    // below the inter-point distances of this random cloud)
    val queries = corpus.filter($"vec_id" < 5)
    val encoded = Quantization.sq8Encode(corpus, model)
    val got = Quantization.sq8TopK(encoded, queries, model, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vecs = data.toMap.view.mapValues(_.toArray.map(_.toDouble)).toMap
    (0L until 5L).foreach { q =>
      val nn = vecs.keys.filter(_ != q).minBy(n =>
        (vecs(q).zip(vecs(n)).map { case (x, y) => (x - y) * (x - y) }.sum, n))
      assert(got(q).contains(nn), s"query $q: exact NN $nn not in SQ8 top-3 ${got(q)}")
    }
  }
}
