package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * NN-DESCENT k-NN GRAPH construction (Dong, Moses, Li, "Efficient k-nearest
 * neighbor graph construction for generic similarity measures", WWW 2011):
 * the batch operator that feeds semantic-dedup cells, curation clustering,
 * and graph-based retrieval indexes. The principle is "a neighbor of a
 * neighbor is likely a neighbor": start from cheap approximate lists, then
 * repeatedly score CANDIDATE pairs that share a pivot in the current graph
 * and keep each point's best k.
 *
 * Scale shape — bucketed, never all-pairs:
 *  - init pairs come from multi-seed sign-LSH buckets
 *    ([[Similarity.hyperplaneBucket]]), each bucket's contribution capped
 *    deterministically at `maxPivotDegree` rows;
 *  - every refinement round's candidates are pairs of neighbors sharing a
 *    pivot in the (undirected, degree-capped) current graph — at most
 *    `maxPivotDegree²` pairs per pivot, independent of corpus size;
 *  - scored rows are narrow (id, id, cosine); vectors join in per round and
 *    never cross an exchange inside the top-k merge.
 *
 * Everything is deterministic (seeded hyperplanes, fixed iteration count,
 * ties broken on neighbor id), and the cosine fold is bit-identical to
 * [[Similarity.bruteForceTopK]] — so when the parameters give exact
 * convergence on a corpus (the v15 gate's setting), the output hash-matches
 * the brute-force oracle; NnDescentSpec pins a recall floor at weaker
 * settings.
 */
object NnDescent {

  /**
   * Build the k-NN graph of `vecs` under cosine similarity.
   * @return (idCol, neighbor_id, cosine, rank) — k rows per input id
   *         (fewer only for ids whose candidates never surfaced them).
   */
  /**
   * @param initBits hyperplane count per LSH seed; 0 (the default) sizes
   *        it to the corpus so expected bucket occupancy ≈ maxPivotDegree
   *        — a FIXED bit count either leaves buckets so full the degree
   *        cap excludes most points from init (big corpus) or so empty
   *        no pairs form (small corpus).
   */
  def knnGraph(vecs: DataFrame, k: Int, iterations: Int,
               idCol: String = "vec_id", vecCol: String = "embedding",
               initSeeds: Seq[Long] = Seq(42L, 1042L), initBits: Int = 0,
               maxPivotDegree: Int = 64): DataFrame = {
    require(k >= 1, s"k=$k")
    require(iterations >= 0, s"iterations=$iterations")
    require(maxPivotDegree >= 2 * k,
      s"maxPivotDegree=$maxPivotDegree must be >= 2k (=${2 * k}) or the " +
        "undirected graph can't hold a point's own list plus reverses")
    require(initSeeds.nonEmpty, "need at least one init seed")
    val v = vecs.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("__v"), Similarity.normFast(col(vecCol)).as("__n"))
      .filter(col("__n").isNotNull && col("__n") > 0)
      .localCheckpoint()
    if (v.isEmpty)
      return v.select(col("id").as(idCol), col("id").as("neighbor_id"),
        lit(0.0).as("cosine"), lit(1).as("rank")).limit(0)
    val dim = v.select(size(col("__v"))).head().getInt(0)
    val n = v.count()
    val bits =
      if (initBits > 0) initBits
      else {
        val buckets = math.max(1L, n / maxPivotDegree)
        math.max(2, math.min(24,
          64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))))
      }
    // Shuffle width derived from the CORPUS SIZE, not the session default
    // (guide §2: scale-adaptive partitioning): the refinement loop runs
    // ~6 keyed stages per round on frames of O(n·k) narrow rows, so at
    // small n a session-wide width just multiplies task overhead across
    // every round, while at large n this caps at the core count. Each
    // explicit repartition below provides the clustering its whole stage
    // chain needs (hash on a SUBSET of the downstream keys), so the
    // dedup/window/self-join stack reuses ONE exchange per round.
    val par = math.max(1, math.min(
      v.sparkSession.sparkContext.defaultParallelism, (n / 4096L).toInt + 1))

    def scorePairs(pairs: DataFrame): DataFrame =
      pairs
        .join(v.select(col("id").as("id_a"), col("__v").as("__va"),
          col("__n").as("__na")), "id_a")
        .join(v.select(col("id").as("id_b"), col("__v").as("__vb"),
          col("__n").as("__nb")), "id_b")
        .withColumn("cosine", Similarity.cosineFromParts(
          Similarity.dotFast(col("__va"), col("__vb")), col("__na"), col("__nb")))
        .filter(col("cosine").isNotNull)
        .select("id_a", "id_b", "cosine")

    def bothDirections(sc: DataFrame): DataFrame =
      sc.select(col("id_a").as("id"), col("id_b").as("nbr"), col("cosine"))
        .unionByName(
          sc.select(col("id_b").as("id"), col("id_a").as("nbr"), col("cosine")))

    def topK(directed: DataFrame): DataFrame = {
      // same (id, nbr) scored twice carries the identical cosine (same
      // commutative fold), so dropDuplicates is value-safe
      val w = Window.partitionBy("id").orderBy(col("cosine").desc, col("nbr"))
      directed.repartition(par, col("id"))
        .dropDuplicates("id", "nbr")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .drop("__rk")
    }

    /** capped intra-bucket pairs of one LSH seed — init AND the per-round
      * diversification (a fresh seed each round rescues points whose lists
      * converged inside the wrong neighborhood, the classic NN-Descent
      * local optimum; deterministic because the seed schedule is). */
    def bucketPairs(seed: Long): DataFrame = {
      val b = v.select(col("id"),
        Similarity.hyperplaneBucket(col("__v"), dim, bits, seed).as("__b"))
      // cap order rotates WITH the seed: a fixed order (e.g. by id) would
      // exclude the same members from over-full buckets every round, so
      // those points could never pair up however many rounds run
      val wB = Window.partitionBy("__b")
        .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      val capped = b.repartition(par, col("__b"))
        .withColumn("__i", row_number().over(wB))
        .filter(col("__i") <= maxPivotDegree)
        .drop("__i")
      capped.as("a").join(capped.as("b"), Seq("__b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }

    // ---- init: multi-seed LSH buckets → capped intra-bucket pairs ----
    val initPairs = initSeeds.map(bucketPairs).reduce(_ unionByName _).distinct()
    var knn = topK(bothDirections(scorePairs(initPairs))).localCheckpoint()

    // ---- refine: neighbors-of-neighbors + one fresh LSH seed per round ----
    var it = 0
    while (it < iterations) {
      val adj = knn.select(col("id"), col("nbr"))
        .unionByName(knn.select(col("nbr").as("id"), col("id").as("nbr")))
        .repartition(par, col("id"))
        .distinct()
      val wA = Window.partitionBy("id").orderBy(col("nbr"))
      val capped = adj.withColumn("__i", row_number().over(wA))
        .filter(col("__i") <= maxPivotDegree)
        .drop("__i")
      val cands = capped.as("a").join(capped.as("b"), Seq("id"))
        .filter(col("a.nbr") < col("b.nbr"))
        .select(col("a.nbr").as("id_a"), col("b.nbr").as("id_b"))
        .unionByName(bucketPairs(initSeeds.head + 7919L * (it + 1)))
        .repartition(par, col("id_a"))
        .distinct()
      knn = topK(knn.unionByName(bothDirections(scorePairs(cands))))
        .localCheckpoint()
      it += 1
    }
    val w = Window.partitionBy("id").orderBy(col("cosine").desc, col("nbr"))
    knn.withColumn("rank", row_number().over(w))
      .select(col("id").as(idCol), col("nbr").as("neighbor_id"),
        col("cosine"), col("rank"))
  }
}
