package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor similarity search over an embedding column
 * (`array<float>`).
 *
 *  - [[cosine]] / [[dot]]: codegen'd vector math via `zip_with` +
 *    `aggregate` — no UDF, stays inside whole-stage codegen.
 *  - [[bruteForceTopK]]: exact top-k for a (small, broadcast) query set —
 *    the correctness baseline. One narrow pass over the corpus + a top-k
 *    window; scales to any corpus size (queries are broadcast).
 *  - [[lshBucketedTopK]]: random-hyperplane LSH variant — corpus and queries
 *    are bucketed by sign-pattern; only same-bucket pairs are scored. The
 *    100 TB path: the bucket join is an equi-join (shuffle on bucket key),
 *    candidate count is output-bound.
 */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), norm(a), norm(b))

  /** `dot / (na*nb)` with a zero-norm guard: a degenerate (all-zero) vector
    * gets a NULL cosine — filtered out of top-k rankings and below any
    * near-dup threshold — instead of crashing the whole job under ANSI
    * division. At corpus scale one bad row must not kill the query. */
  def cosineFromParts(dotV: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, lit(null)).otherwise(dotV / denom)
  }

  /**
   * JIT-compiled twins of [[dot]]/[[norm]] with IDENTICAL arithmetic (the
   * same float→double sequential fold, so results are bit-identical to the
   * built-in `aggregate` formulation and to a DuckDB `list_reduce` oracle).
   * The higher-order-function expressions evaluate their lambda interpreted
   * per element — fine for thousands of pairs, ruinous for millions; these
   * run as one tight loop per row.
   */
  val dotFast = udf { (a: Array[Float], b: Array[Float]) =>
    // Array[Float] (not Seq[Float]) is load-bearing: the primitive signature
    // converts via one bulk toFloatArray copy, where the generic Seq
    // interface boxes every element access in the loop — these run once per
    // CANDIDATE PAIR, the highest-multiplicity site in the ANN/near-dup path
    if (a == null || b == null) null
    else {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      java.lang.Double.valueOf(acc)
    }: java.lang.Double
  }
  val normFast = udf { (a: Array[Float]) =>
    if (a == null) null
    else {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
      java.lang.Double.valueOf(math.sqrt(acc))
    }: java.lang.Double
  }

  /**
   * Exact top-k neighbors for each query vector.
   * @param corpus  (idCol, vecCol) — any size
   * @param queries (idCol, vecCol) — small enough to broadcast
   */
  /**
   * @param excludeSameCol when set, candidates sharing the query's value
   *        in this column are filtered out — the HARD-NEGATIVE MINING
   *        contract for contrastive training: nearest vectors that are
   *        NOT the query's own class (v07). None = plain nearest
   *        neighbours.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSameCol: Option[String] = None): DataFrame = {
    // norms once per ROW (queries broadcast with theirs precomputed), one
    // primitive dot per pair, and the top-k window shuffles only narrow
    // (query_id, neighbor_id, cosine) rows — the n×q scored set never
    // carries vectors through an exchange. Same fold order as the HOF
    // formulation → bit-identical to the DuckDB oracle.
    val qCols = Seq(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), normFast(col(vecCol)).as("__qn")) ++
      excludeSameCol.map(c => col(c).as("__qx"))
    val cCols = Seq(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), normFast(col(vecCol)).as("__cn")) ++
      excludeSameCol.map(c => col(c).as("__cx"))
    val q = broadcast(queries.select(qCols: _*))
    val paired = corpus.select(cCols: _*)
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
    // apply the exclusion only when requested — an unconditional
    // filter(lit(true)) node measurably broke codegen fusion on the 1M-row
    // scored pass (ScaleBench ann: 6.1 s -> 11.1 s) before being a no-op
    // null-rejecting =!= matches SQL `<>` three-valued logic (the v07
    // oracle): a pair where either label is NULL is DROPPED, not kept —
    // the null-safe !(<=>) variant silently diverged on nullable columns
    val scored = excludeSameCol.fold(paired)(_ =>
      paired.filter(col("__cx") =!= col("__qx")))
      .withColumn("cosine", cosineFromParts(
        dotFast(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .filter(col("cosine").isNotNull)
      .select("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane sign bucket of a vector: `bits` pseudo-random
    * hyperplanes (deterministic seed), bucket = sign bit-pattern. Two vectors
    * collide with probability (1 - theta/pi)^bits. One-pass UDF — an
    * expression-tree formulation (bits × dim literal multiplies) blows
    * codegen up to multi-MB task binaries. */
  def hyperplaneBucket(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rng.nextGaussian())
    val f = udf { (v: Array[Float]) =>
      if (v == null) null
      else {
        var bucket = 0L
        var b = 0
        while (b < bits) {
          var s = 0.0
          val p = planes(b)
          var i = 0
          val n = math.min(dim, v.length)
          while (i < n) { s += p(i) * v(i); i += 1 }
          if (s >= 0) bucket |= (1L << b)
          b += 1
        }
        java.lang.Long.valueOf(bucket)
      }
    }
    f(vec)
  }

  /**
   * IVF (inverted-file) ANN index: k-means centroids learned driver-side on
   * a bounded sample (deterministic seeded Lloyd's — the index build is
   * cheap and broadcastable), corpus partitioned by nearest centroid, and
   * queries probe only the `nprobe` nearest cells. The classic
   * coarse-quantizer scale path: the probe join is an equi-join on cell id,
   * candidates per query ≈ nprobe/k of the corpus.
   */
  def ivfIndex(corpus: DataFrame, dim: Int, k: Int, sampleSize: Int = 2000,
               iterations: Int = 8, seed: Long = 42L,
               idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val sample = corpus.select(vecCol).limit(sampleSize).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty corpus")
    val rng = new scala.util.Random(seed)
    var centroids = Array.fill(k)(sample(rng.nextInt(sample.length)).clone())
    (0 until iterations).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < math.min(dim, v.length)) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) sample(rng.nextInt(sample.length)).clone()
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val cen = centroids(c)
      val n = math.min(cen.length, v.length)
      while (i < n) { val x = v(i) - cen(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Top-`nprobe` nearest centroids of a vector. */
  private[llm] def probeCells(v: Array[Double], centroids: Array[Array[Double]], nprobe: Int): Array[Int] =
    centroids.indices.map { c =>
      var d = 0.0; var i = 0
      val cen = centroids(c)
      val n = math.min(cen.length, v.length)
      while (i < n) { val x = v(i) - cen(i); d += x * x; i += 1 }
      (c, d)
    }.sortBy(_._2).take(nprobe).map(_._1).toArray

  /** Persist an IVF centroid set as a small parquet (one row per cell).
    * The index is built once and reused across query batches — at corpus
    * scale the expensive part is assigning cells to the corpus, and that
    * too is done once via [[assignCells]] + a `partitionBy("cell")` write. */
  def saveIvfModel(spark: org.apache.spark.sql.SparkSession,
                   centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadIvfModel(spark: org.apache.spark.sql.SparkSession,
                   path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)

  /** Corpus with its nearest-centroid cell attached — write this
    * `partitionBy("cell")` so probe queries prune to `nprobe` of `nCells`
    * partitions at the parquet scan. */
  def assignCells(corpus: DataFrame, centroids: Array[Array[Double]],
                  vecCol: String = "embedding"): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf { (v: Array[Float]) =>
      if (v == null) null
      else Integer.valueOf(nearestCentroid(v.map(_.toDouble), bc.value))
    }
    corpus.withColumn("cell", assignUdf(col(vecCol)))
  }

  /** Soft (multi-probe) cell assignment: each row explodes into its
    * `nProbe` nearest cells. The recall side of the IVF trade — a
    * within-cell candidate pass misses a pair only when the two vectors
    * share none of their nProbe cells. Output rows = nProbe × input. */
  def assignCellsMulti(corpus: DataFrame, centroids: Array[Array[Double]],
                       nProbe: Int, vecCol: String = "embedding"): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val probeUdf = udf { (v: Array[Float]) =>
      if (v == null) null
      else probeCells(v.map(_.toDouble), bc.value, nProbe)
    }
    corpus.withColumn("cell", explode(probeUdf(col(vecCol))))
  }

  /**
   * IVF-bucketed top-k: corpus rows live in their nearest-centroid cell;
   * each query probes its `nprobe` nearest cells; cosine scored only on
   * candidates. Equi-join on cell id — shuffle keyed by cell, output-bound.
   * Builds the index inline; for a persisted index use [[ivfIndex]] +
   * [[saveIvfModel]]/[[loadIvfModel]] + [[assignCells]] and call
   * [[ivfTopKAssigned]] with the prepartitioned corpus.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nCells: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = ivfIndex(corpus, dim, nCells, idCol = idCol, vecCol = vecCol)
    val assigned = assignCells(
      corpus.select(col(idCol), col(vecCol)), centroids, vecCol)
    ivfTopKAssigned(assigned, queries, centroids, k, nprobe, idCol, vecCol)
  }

  /** Probe a cell-assigned corpus (column `cell`, e.g. read back from a
    * `partitionBy("cell")` parquet) with a prebuilt centroid set. */
  def ivfTopKAssigned(assigned: DataFrame, queries: DataFrame,
                      centroids: Array[Array[Double]], k: Int, nprobe: Int = 4,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bc = assigned.sparkSession.sparkContext.broadcast(centroids)
    val probeUdf = udf { (v: Array[Float]) =>
      if (v == null) null
      else probeCells(v.map(_.toDouble), bc.value, nprobe)
    }
    // norms once per row, primitive dot per candidate, and only narrow rows
    // reach the top-k window shuffle (the probe join itself broadcasts the
    // exploded query side, so corpus vectors stream without an exchange)
    val c = assigned.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), normFast(col(vecCol)).as("__cn"), col("cell"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), normFast(col(vecCol)).as("__qn"))
      .withColumn("cell", explode(probeUdf(col("__qv"))))
    val cand = c.join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineFromParts(
        dotFast(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .filter(col("cosine").isNotNull)
      .select("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /**
   * LSH-bucketed ANN: score only same-bucket (query, corpus) pairs. With
   * multiple probe tables (`tables`), recall improves; each table is an
   * independent set of hyperplanes.
   *
   * Parameter sizing matters: `bits` should track log2(corpus size) so
   * buckets hold a handful of vectors each — too many bits over a small
   * corpus candidate-starves every query. `multiprobe` additionally probes
   * all Hamming-distance-1 buckets of each query's bucket (bits extra
   * lookups per table), buying the recall of ~`bits`× more tables without
   * replicating the corpus — the standard memory/recall trade
   * (multi-probe LSH, Lv et al., VLDB'07). Probing expands only the QUERY
   * side (small), never the corpus side.
   */
  def lshBucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                      bits: Int = 12, tables: Int = 4, multiprobe: Boolean = false,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = lshCandidates(corpus, queries, dim, bits, tables, multiprobe,
      idCol, vecCol)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** The shared LSH-bucketed candidate stage of [[lshBucketedTopK]] and
    * [[rangeSearch]]: deduped same-bucket pairs with exact cosines. */
  private def lshCandidates(corpus: DataFrame, queries: DataFrame, dim: Int,
                            bits: Int, tables: Int, multiprobe: Boolean,
                            idCol: String, vecCol: String): DataFrame = {
    // norms once per row (computed before the bucket explode, so each input
    // row folds once however many tables replicate it)
    val withBuckets = (df: DataFrame, side: String) => df.select(
      col(idCol).as(s"${side}_id"), col(vecCol).as(s"__${side}v"),
      normFast(col(vecCol)).as(s"__${side}n"),
      posexplode(array((0 until tables).map(t =>
        hyperplaneBucket(col(vecCol), dim, bits, seed = 42L + 1000L * t)): _*))
        .as(Seq("table", "bucket")))
    val c = withBuckets(corpus, "neighbor")
    val q0 = withBuckets(queries, "query")
    val q = if (!multiprobe) q0 else q0.withColumn("bucket",
      explode(array(col("bucket") +:
        (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*)))
    // primitive dot per candidate (≤ tables-way duplicate pairs score
    // redundantly at ~1 µs each — cheaper than a dedup-then-join-back);
    // narrow BEFORE the pair dedup + downstream window/filter, so the only
    // exchanges carrying data after the bucket join see (query_id,
    // neighbor_id, cosine) rows, never vectors
    c.join(q, Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineFromParts(
        dotFast(col("__queryv"), col("__neighborv")),
        col("__queryn"), col("__neighborn")))
      .filter(col("cosine").isNotNull)
      .select("query_id", "neighbor_id", "cosine")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /**
   * Radius (range) search: ALL corpus neighbours with `cosine >= tau` of
   * each query — the retrieval companion of top-k. Dedup sweeps and
   * recall-bounded RAG filters want "everything at least this similar",
   * not a fixed k: the answer-set size varies per query (possibly empty),
   * which a top-k can only bracket. Candidates come from the same
   * LSH-bucketed stage as [[lshBucketedTopK]] — bucketed, never
   * all-pairs — with the recall knobs (bits / tables / multiprobe)
   * shared; at 100 TB the output is bounded by the bucket structure, not
   * the corpus square. The threshold comparison is engine-portable: the
   * cosine folds in the shared left-to-right double order (the v01
   * contract), so `>= tau` flips identically in an external oracle even
   * exactly at the boundary. Emits order-free (query_id, neighbor_id,
   * cosine); downstream ranks if it needs ranks.
   */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, tau: Double, dim: Int,
                  bits: Int = 12, tables: Int = 4, multiprobe: Boolean = false,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshCandidates(corpus, queries, dim, bits, tables, multiprobe, idCol, vecCol)
      .filter(col("cosine") >= tau)

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
   * SIGIR'98) over each query's candidate set: greedily pick `k` of the
   * candidates maximizing `λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s)` —
   * the diversified-retrieval selection a RAG context builder or
   * eval-set sampler runs AFTER ANN, so near-identical candidates don't
   * all make the window.
   *
   * Scale shape: `candidates` is output-bound (top-N per query from
   * [[bruteForceTopK]] / [[lshBucketedTopK]] / IVF), so the
   * candidate-pair sim matrix is ≤ N²/2 narrow rows per query via one
   * equi-join on query_id, and the greedy selection is per-query local
   * work over ≤ N rows (`cogroup` of rel and sim streams) — distributed
   * across queries, no global state, vectors never cross an exchange
   * after the sim join. Doubles stay ENGINE-PORTABLE: rel/sim use the
   * shared fold-order dot ([[dotFast]], the v01 contract) and a dyadic
   * `lambda` (0.5 default) keeps every score op exactly-rounded, so an
   * external oracle replays the same picks bit-for-bit; ties break by
   * ascending candidate id. Only ids and ranks are emitted.
   *
   * @param candidates (query_id, neighbor_id, cosine) — the relevance-
   *                   ranked candidate pool per query
   * @return (query_id, pick, neighbor_id), pick = 1-based selection order
   */
  def mmrRerank(candidates: DataFrame, embeddings: DataFrame, k: Int,
                lambda: Double = 0.5, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val emb = embeddings.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__v"), normFast(col(vecCol)).as("__n"))
    val cand = candidates.join(emb, Seq("neighbor_id"))
    val aSide = cand.select(col("query_id"), col("neighbor_id").as("id_a"),
      col("__v").as("va"), col("__n").as("na"))
    val bSide = cand.select(col("query_id"), col("neighbor_id").as("id_b"),
      col("__v").as("vb"), col("__n").as("nb"))
    val pairSims = aSide.join(bSide, Seq("query_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("query_id"), col("id_a"), col("id_b"),
        cosineFromParts(dotFast(col("va"), col("vb")),
          col("na"), col("nb")).as("sim"))
      .filter(col("sim").isNotNull)
    val relByQ = candidates.select(col("query_id").cast("long"),
        col("neighbor_id").cast("long"), col("cosine").cast("double"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val simByQ = pairSims.select(col("query_id").cast("long"),
        col("id_a").cast("long"), col("id_b").cast("long"),
        col("sim").cast("double"))
      .as[(Long, Long, Long, Double)].groupByKey(_._1)
    relByQ.cogroup(simByQ) { (q, rels, sims) =>
      // ascending-id candidate order makes the strict `>` comparison a
      // deterministic min-id tie-break (ORDER BY score DESC, id)
      val rel = rels.map(r => r._2 -> r._3).toArray.sortBy(_._1)
      val simMap = sims.map(s => (s._2, s._3) -> s._4).toMap
      def simOf(x: Long, y: Long): Double =
        if (x < y) simMap.getOrElse((x, y), 0.0)
        else simMap.getOrElse((y, x), 0.0)
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
      var r = 1
      while (r <= k && picked.length < rel.length) {
        var bestId = -1L
        var bestScore = Double.NegativeInfinity
        rel.foreach { case (c, relC) =>
          if (!picked.contains(c)) {
            val div =
              if (picked.isEmpty) 0.0
              else picked.iterator.map(s => simOf(c, s)).max
            val score = lambda * relC - (1 - lambda) * div
            if (score > bestScore) { bestScore = score; bestId = c }
          }
        }
        picked += bestId
        out += ((q, r, bestId))
        r += 1
      }
      out.iterator
    }.toDF("query_id", "pick", "neighbor_id")
  }
}
