package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("cosine column matches scalar computation") {
    val df = Seq((1L, vec(1, 0, 0)), (2L, vec(0.6, 0.8, 0))).toDF("vec_id", "embedding")
    val c = df.filter($"vec_id" === 1).crossJoin(
        df.filter($"vec_id" === 2).select($"embedding".as("other")))
      .select(Similarity.cosine($"embedding", $"other").as("c")).as[Double].head()
    assert(math.abs(c - 0.6) < 1e-6)
  }

  test("brute force top-k returns nearest by cosine") {
    val rng = new scala.util.Random(1)
    val base = (1 to 50).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat)))
    // vector 51 = copy of vector 1 (cosine 1), so NN of 51 must be 1
    val df = (base :+ (51L, base.head._2)).toDF("vec_id", "embedding")
    val nn = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 51), k = 1)
      .select("neighbor_id").as[Long].head()
    assert(nn == 1L)
  }

  test("mmrRerank: diversity flips the second pick away from a near-duplicate") {
    // query 0 at e1; candidates: 1 ≈ e1 (rel ≈ .995), 2 = copy of 1
    // (rel ≈ .995 but sim(1,2) = 1), 3 off-axis (rel .8, sim(1,3) ≈ .74).
    // Pure relevance picks (1, 2, 3); MMR at λ=0.5 must pick 3 second:
    // score(2|{1}) = .5·.995 − .5·1 ≈ −.003 < score(3|{1}) = .5·.8 −
    // .5·.74 ≈ +.03
    val df = Seq(
      (0L, vec(1, 0, 0)),
      (1L, vec(1, 0.1, 0)),
      (2L, vec(1, 0.1, 0)),
      (3L, vec(0.8, -0.6, 0))).toDF("vec_id", "embedding")
    val cands = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 0), k = 3)
    val picks = Similarity.mmrRerank(cands, df, k = 3)
      .orderBy("pick").select("neighbor_id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 3L, 2L), s"got $picks")
    // λ=1 degenerates to pure relevance order (min-id tie-break on the copy)
    val pure = Similarity.mmrRerank(cands, df, k = 3, lambda = 1.0)
      .orderBy("pick").select("neighbor_id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L, 3L), s"got $pure")
    // k capped by the candidate pool
    val few = Similarity.mmrRerank(cands, df, k = 10)
      .select("pick").as[Int].collect().toSeq.sorted
    assert(few == Seq(1, 2, 3))
  }

  test("rangeSearch: equals the brute-force radius set at full-recall LSH params") {
    val rng = new scala.util.Random(7)
    val base = (1 to 60).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat)))
    val df = base.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" <= 5)
    val tau = 0.125 // dyadic, like the v10 gate
    // oracle: brute-force cosine over all pairs, thresholded
    val brute = Similarity.bruteForceTopK(df, qs, k = 60)
      .filter($"cosine" >= tau)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.rangeSearch(df, qs, tau = tau, dim = 16,
        bits = 4, tables = 12, multiprobe = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == brute, s"range set mismatch: missing=${brute -- got} extra=${got -- brute}")
    // a query with an empty radius set simply emits nothing (no null rows)
    val none = Similarity.rangeSearch(df, qs, tau = 1.5, dim = 16,
      bits = 4, tables = 12, multiprobe = true)
    assert(none.count() == 0)
  }

  test("hard-negative mining: same-label candidates excluded, nearest other-label wins") {
    val rng = new scala.util.Random(2)
    val base = (1 to 40).map(i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat), i % 2))
    // 41 copies vector 1 (label 1) but carries label 1 too — with
    // excludeSameCol its twin is INVISIBLE and some label-0 vector wins;
    // without, the twin wins
    val df = (base :+ (41L, base.head._2, 1)).toDF("vec_id", "embedding", "label")
    val plain = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 41), k = 1)
      .select("neighbor_id").as[Long].head()
    assert(plain == 1L)
    val hard = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 41), k = 5,
        excludeSameCol = Some("label"))
      .select("neighbor_id").as[Long].collect().toSeq
    assert(!hard.contains(1L) && hard.nonEmpty)
    // every mined negative carries the OTHER label
    val labels = df.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    hard.foreach(n => assert(labels(n) == 0))
  }

  test("zero vectors get null cosine (no ANSI divide-by-zero) and never rank") {
    // one degenerate row must not kill a corpus-scale job: the zero vector's
    // cosine is undefined (0/0) — it is excluded from rankings, both as a
    // neighbor and as a query, and nothing throws under ANSI mode
    val df = Seq(
      (1L, vec(1, 0, 0)), (2L, vec(0.8, 0.6, 0)), (3L, vec(0, 1, 0)),
      (9L, vec(0, 0, 0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, df, k = 3).collect()
    assert(!out.exists(r => r.getLong(1) == 9L), "zero vector ranked as a neighbor")
    assert(!out.exists(r => r.getLong(0) == 9L), "zero-vector query produced rows")
    assert(out.forall(!_.isNullAt(2)))
    val pairs = Dedup.cosineNearDupExact(df, "vec_id", "embedding", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(p => p._1 == 9L || p._2 == 9L))
  }

  test("IVF-bucketed ANN achieves high recall@5 vs brute force on clustered data") {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(5)(Array.fill(32)(rng.nextGaussian() * 3))
    val corpus = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(corpus, queries, k = 5, dim = 32,
        nCells = 10, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("LSH-bucketed ANN achieves high recall@5 vs brute force on clustered data") {
    val rng = new scala.util.Random(2)
    // clustered vectors so LSH buckets are meaningful
    val centers = Array.fill(5)(Array.fill(64)(rng.nextGaussian() * 3))
    val corpus = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshBucketedTopK(corpus, queries, k = 5, dim = 64,
        bits = 8, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("persisted IVF index: model round-trips and a cell-partitioned corpus probe " +
    "matches the inline build with partition pruning at the scan") {
    val rng = new scala.util.Random(9)
    val corpus = (0 until 150).map(i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
    val tmp = java.nio.file.Files.createTempDirectory("ivf_spec").toString

    val centroids = Similarity.ivfIndex(corpus, dim = 16, k = 8)
    Similarity.saveIvfModel(spark, centroids, s"$tmp/model")
    val loaded = Similarity.loadIvfModel(spark, s"$tmp/model")
    assert(loaded.length == centroids.length)
    assert(loaded.zip(centroids).forall { case (a, b) => a.sameElements(b) })

    // build once, write partitioned by cell, probe the persisted layout
    Similarity.assignCells(corpus, loaded)
      .write.partitionBy("cell").parquet(s"$tmp/corpus")
    val persisted = spark.read.parquet(s"$tmp/corpus")
    val viaPersisted = Similarity.ivfTopKAssigned(persisted, queries, loaded, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val inline = Similarity.ivfTopK(corpus, queries, k = 3, dim = 16,
        nCells = 8, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaPersisted == inline)

    // the scale property: a probe that names its cells prunes the scan to
    // those partitions instead of reading the whole corpus
    val pruned = persisted.filter($"cell".isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), plan)
    val readFiles = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(readFiles.nonEmpty &&
      readFiles.forall(f => f.contains("cell=0") || f.contains("cell=1")),
      s"scan read outside the probed cells: ${readFiles.mkString(", ")}")
  }
}
