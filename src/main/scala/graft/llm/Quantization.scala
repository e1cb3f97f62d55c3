package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ; Jégou, Douze & Schmid, "Product Quantization
 * for Nearest Neighbor Search", TPAMI 2011) for embedding similarity at
 * corpus scale: each
 * vector is split into `m` subvectors, each subvector replaced by the id of
 * its nearest codeword from a per-subspace codebook (k ≤ 256 → one byte per
 * subvector). A `dim`-float embedding compresses to `m` bytes (e.g. 128
 * floats = 512 bytes → 8 bytes at m=8), so a 100 TB float corpus becomes a
 * ~1.5 TB code table that stays scan-resident.
 *
 * Search uses asymmetric distance computation (ADC): per query, an m × k
 * table of exact subvector distances is precomputed once; each corpus row
 * is scored with m table lookups — no float vector is touched at scan time.
 *
 * Scale shape: training is a bounded driver-side sample (like [[Similarity.ivfIndex]]);
 * encoding is one narrow UDF pass; ADC scoring is a narrow pass over the
 * code column with broadcast lookup tables + a top-k window. Compose with
 * IVF cells ([[Similarity.assignCells]]) for the classic IVF-PQ layout:
 * partition pruning picks the cells, ADC ranks inside them.
 */
object Quantization {

  /** `codebooks(j)(c)` = codeword `c` of subspace `j`, length `dim / m`. */
  case class PqModel(dim: Int, m: Int, k: Int,
                     codebooks: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    require(k <= 256, "k must fit a byte code")
    val subDim: Int = dim / m
  }

  /** Train per-subspace codebooks with seeded Lloyd's k-means on a bounded
    * sample (deterministic; the sample bound makes the driver step cheap). */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
            sampleSize: Int = 2000, iterations: Int = 8, seed: Long = 42L,
            vecCol: String = "embedding"): PqModel = {
    val sample = corpus.select(vecCol).limit(sampleSize).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    trainOnSample(sample, dim, m, k, iterations, seed)
  }

  /** The k-means core over an in-memory sample (shared by [[train]] and the
    * OPQ alternation, which re-trains on rotated samples). */
  private[llm] def trainOnSample(sample: Array[Array[Double]], dim: Int, m: Int,
                                 k: Int, iterations: Int, seed: Long): PqModel = {
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    require(sample.nonEmpty, "empty corpus")
    val subDim = dim / m
    val rng = new scala.util.Random(seed)
    val codebooks = Array.tabulate(m) { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      var cents = Array.fill(k)(subs(rng.nextInt(subs.length)).clone())
      (0 until iterations).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { s =>
          val c = nearestCodeword(s, cents)
          counts(c) += 1
          var i = 0
          while (i < subDim) { sums(c)(i) += s(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) subs(rng.nextInt(subs.length)).clone()
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
    PqModel(dim, m, k, codebooks)
  }

  private[llm] def nearestCodeword(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cen = cents(c)
      while (i < cen.length) {
        val x = (if (i < v.length) v(i) else 0.0) - cen(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** One narrow pass: embedding → `m`-byte PQ code. */
  def encode(df: DataFrame, model: PqModel, vecCol: String = "embedding",
             codeCol: String = "pq_code"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf { (v: Array[Float]) =>
      if (v == null) null
      else {
        val mod = bc.value
        val d = v.map(_.toDouble)
        Array.tabulate(mod.m) { j =>
          val sub = java.util.Arrays.copyOfRange(
            d, j * mod.subDim, math.min((j + 1) * mod.subDim, d.length))
          nearestCodeword(sub, mod.codebooks(j)).toByte
        }
      }
    }
    df.withColumn(codeCol, enc(col(vecCol)))
  }

  /** Persist/load a model as a tiny parquet (one row per (subspace, code)). */
  def saveModel(spark: SparkSession, model: PqModel, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      j <- model.codebooks.indices; c <- model.codebooks(j).indices
    } yield (model.dim, model.m, model.k, j, c, model.codebooks(j)(c).toSeq)
    rows.toDF("dim", "m", "k", "subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
    val head = rows.head
    val (dim, m, k) = (head.getInt(0), head.getInt(1), head.getInt(2))
    val books = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r => books(r.getInt(3))(r.getInt(4)) = r.getSeq[Double](5).toArray }
    PqModel(dim, m, k, books.map(_.toArray))
  }

  private def collectQueries(queries: DataFrame, idCol: String, vecCol: String,
                             what: String): (Array[Long], Array[Array[Double]]) = {
    val qRows = graft.util.Collects.boundedCollect(
      queries.select(col(idCol), col(vecCol)),
      what = what,
      alternative = "batch queries, or join encoded codes directly")
    (qRows.map(_.getLong(0)), qRows.map(_.getSeq[Float](1).toArray.map(_.toDouble)))
  }

  /** ADC lookup table for one vector: table(j)(c) =
    * `|| v subvector_j - codeword_c ||^2`. */
  private def adcTable(mod: PqModel, qv: Array[Double]): Array[Array[Double]] =
    Array.tabulate(mod.m) { j =>
      val sub = java.util.Arrays.copyOfRange(
        qv, j * mod.subDim, math.min((j + 1) * mod.subDim, qv.length))
      mod.codebooks(j).map { cen =>
        var d = 0.0; var i = 0
        while (i < cen.length) {
          val x = (if (i < sub.length) sub(i) else 0.0) - cen(i); d += x * x; i += 1
        }
        d
      }
    }

  /** Per-thread ADC lookup tables, one per query vector. */
  private def queryTables(spark: SparkSession, model: PqModel,
                          qVecs: Array[Array[Double]])
      : graft.util.ThreadLocalCache[Array[Array[Array[Double]]]] = {
    val bcModel = spark.sparkContext.broadcast(model)
    val bcQ = spark.sparkContext.broadcast(qVecs)
    new graft.util.ThreadLocalCache(() => {
      val mod = bcModel.value
      bcQ.value.map(adcTable(mod, _))
    })
  }

  private def topKByDist(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    scored.filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
  }

  /**
   * ADC top-k by approximate squared L2 distance: queries (small, broadcast)
   * get per-subspace lookup tables computed once per executor thread; each
   * corpus row costs `m` lookups per query. Ascending distance, ties by id.
   */
  def adcTopK(encoded: DataFrame, queries: DataFrame, model: PqModel, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              codeCol: String = "pq_code"): DataFrame = {
    val spark = encoded.sparkSession
    val (qIds, qVecs) = collectQueries(queries, idCol, vecCol, "adcTopK query side")
    val bcIds = spark.sparkContext.broadcast(qIds)
    val tables = queryTables(spark, model, qVecs)
    val score = udf { (code: Array[Byte]) =>
      if (code == null) null
      else {
        val t = tables.get
        val ids = bcIds.value
        Array.tabulate(ids.length) { q =>
          var d = 0.0; var j = 0
          val tq = t(q)
          while (j < code.length) { d += tq(j)(code(j) & 0xff); j += 1 }
          (ids(q), d)
        }
      }
    }
    topKByDist(encoded.select(col(idCol).as("neighbor_id"), col(codeCol))
      .withColumn("__qd", explode(score(col(codeCol))))
      .select(col("neighbor_id"), col("__qd._1").as("query_id"), col("__qd._2").as("adc_dist")),
      k)
  }

  /** `v − centroid(cell)` as a float array column. Train/encode PQ on this
    * column for residual IVF-PQ: inside one cell the residuals are small and
    * centered, so the same codebook budget quantizes them much more finely
    * than the absolute vectors (the classical IVF-ADC formulation). */
  def residuals(assigned: DataFrame, ivfCentroids: Array[Array[Double]],
                vecCol: String = "embedding", outCol: String = "residual"): DataFrame = {
    val bc = assigned.sparkSession.sparkContext.broadcast(ivfCentroids)
    val f = udf { (v: Array[Float], cell: Int) =>
      if (v == null) null
      else {
        val cen = bc.value(cell)
        Array.tabulate(v.length)(i =>
          (v(i) - (if (i < cen.length) cen(i) else 0.0)).toFloat)
      }
    }
    assigned.withColumn(outCol, f(col(vecCol), col("cell")))
  }

  /**
   * IVF-PQ: the classic two-level layout — IVF cells
   * ([[Similarity.assignCells]], ideally a `partitionBy("cell")` parquet so
   * the `isin` filter prunes partitions) narrow the corpus to the queries'
   * `nprobe` nearest cells; PQ codes ADC-score only those rows. Each
   * corpus row is scored only for the queries probing its cell.
   *
   * With `residual = true`, the codes must come from [[encode]] over the
   * [[residuals]] column, and each query builds one lookup table per probed
   * cell from its own residual against that cell — finer quantization for
   * the same code budget.
   *
   * With `rotation` set (OPQ-IVFADC, Ge et al. CVPR 2013 §5), the same
   * orthogonal rotation must have been applied before encoding (to the
   * residuals when `residual = true`, else to the raw vectors —
   * [[Opq.rotate]]); query vectors are rotated identically before the
   * lookup tables are built. Rotation after residual subtraction is the
   * classical composition: cell geometry stays in the original space, only
   * the quantizer sees the rotated frame.
   */
  def ivfPqTopK(encoded: DataFrame, queries: DataFrame,
                ivfCentroids: Array[Array[Double]], model: PqModel, k: Int,
                nprobe: Int = 4, residual: Boolean = false, idCol: String = "vec_id",
                vecCol: String = "embedding", codeCol: String = "pq_code",
                rotation: Option[Array[Array[Double]]] = None): DataFrame = {
    val spark = encoded.sparkSession
    val (qIds, qVecs) = collectQueries(queries, idCol, vecCol, "ivfPqTopK query side")
    // probe lists are computed driver-side (queries are already collected)
    val cellToQ: Map[Int, Array[Int]] = qVecs.zipWithIndex
      .flatMap { case (v, qi) => Similarity.probeCells(v, ivfCentroids, nprobe).map(_ -> qi) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val probed = cellToQ.keys.toSeq.sorted
    val bcIds = spark.sparkContext.broadcast(qIds)
    val bcCellToQ = spark.sparkContext.broadcast(cellToQ)
    val bcModel = spark.sparkContext.broadcast(model)
    val bcQ = spark.sparkContext.broadcast(qVecs)
    val bcCents = spark.sparkContext.broadcast(ivfCentroids)
    val bcRot = spark.sparkContext.broadcast(rotation)
    // absolute mode: one table per query; residual mode: one per (query,
    // probed cell), built from the query's residual against that cell
    val tables = new graft.util.ThreadLocalCache[Map[(Int, Int), Array[Array[Double]]]](() => {
      val mod = bcModel.value
      bcCellToQ.value.toSeq.flatMap { case (cell, qs) =>
        qs.map { q =>
          val raw = if (!residual) bcQ.value(q)
          else {
            val cen = bcCents.value(cell)
            val v = bcQ.value(q)
            Array.tabulate(v.length)(i => v(i) - (if (i < cen.length) cen(i) else 0.0))
          }
          val qv = bcRot.value.map(Opq.rotateVec(raw, _)).getOrElse(raw)
          (q, cell) -> adcTable(mod, qv)
        }
      }.toMap
    })
    val score = udf { (cell: Int, code: Array[Byte]) =>
      if (code == null) null
      else {
        val t = tables.get
        val ids = bcIds.value
        bcCellToQ.value.getOrElse(cell, Array.empty[Int]).map { q =>
          var d = 0.0; var j = 0
          val tq = t((q, cell))
          while (j < code.length) { d += tq(j)(code(j) & 0xff); j += 1 }
          (ids(q), d)
        }
      }
    }
    topKByDist(encoded.filter(col("cell").isin(probed: _*))
      .select(col(idCol).as("neighbor_id"), col("cell"), col(codeCol))
      .withColumn("__qd", explode(score(col("cell"), col(codeCol))))
      .select(col("neighbor_id"), col("__qd._1").as("query_id"), col("__qd._2").as("adc_dist")),
      k)
  }

  // ------------------------------------------------------- SQ8 (scalar)

  /** Per-dimension `[min, max]` ranges for 8-bit SCALAR quantization (SQ8
    * — the Faiss `ScalarQuantizer` layout): unlike PQ's learned codebooks,
    * the "model" is just 2·dim floats from one exact aggregate pass, and
    * unlike PQ the code→value map is deterministic arithmetic — which is
    * what makes the v11 gate hash-EXACT instead of a recall property:
    * min/max of floats involve no rounding, and encode/dequant/distance
    * are one pinned IEEE op tree both engines replay. */
  case class Sq8Model(mins: Array[Double], maxs: Array[Double])

  /** One aggregate pass over the corpus: 2·dim scalar min/max aggregates
    * (map-side combinable, one shuffle of a single row). The model is
    * 2·dim doubles — a bounded driver-side value like the PQ codebooks. */
  def sq8Train(corpus: DataFrame, dim: Int,
               vecCol: String = "embedding"): Sq8Model = {
    val aggs =
      (0 until dim).map(i =>
        min(element_at(col(vecCol), i + 1).cast("double")).as(s"mn$i")) ++
      (0 until dim).map(i =>
        max(element_at(col(vecCol), i + 1).cast("double")).as(s"mx$i"))
    val row = corpus.agg(aggs.head, aggs.tail: _*).head()
    Sq8Model(Array.tabulate(dim)(row.getDouble),
      Array.tabulate(dim)(i => row.getDouble(dim + i)))
  }

  /** Encode to one byte per dimension — `floor((v − min)·255 / span)`,
    * clamped — a 4× shrink of a float32 corpus (16× vs float32 PQ-style
    * claims don't apply: SQ8 keeps every dimension). Narrow map. */
  def sq8Encode(df: DataFrame, model: Sq8Model, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val mins = model.mins; val maxs = model.maxs
    val enc = udf { (v: Array[Float]) =>
      if (v == null || v.length < mins.length) null
      else {
        val out = new Array[Byte](mins.length)
        var i = 0
        while (i < mins.length) {
          val span = maxs(i) - mins(i)
          val c =
            if (span == 0.0) 0
            else {
              val f = math.floor(((v(i).toDouble - mins(i)) * 255.0) / span)
              if (f < 0) 0 else if (f > 255) 255 else f.toInt
            }
          out(i) = c.toByte
          i += 1
        }
        out
      }: Array[Byte]
    }
    df.select(col(idCol), enc(col(vecCol)).as("codes"))
  }

  /** Exact top-k by asymmetric L2 over SQ8 codes: the query stays float,
    * each corpus dimension dequantizes to `min + code·span/255` inside the
    * distance fold — one tight primitive loop per pair (the dotFast
    * rationale), broadcast queries, narrow scored rows into the top-k
    * window. Ties break on neighbor_id; `dist` is engine-local (the d25
    * rule) — callers hash ids/ranks only. */
  def sq8TopK(encoded: DataFrame, queries: DataFrame, model: Sq8Model,
              k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val mins = model.mins; val maxs = model.maxs
    val dist = udf { (codes: Array[Byte], q: Array[Float]) =>
      if (codes == null || q == null || q.length < codes.length) null
      else {
        var acc = 0.0; var i = 0
        while (i < codes.length) {
          val span = maxs(i) - mins(i)
          val r = if (span == 0.0) mins(i)
                  else mins(i) + ((codes(i) & 0xFF).toDouble * span) / 255.0
          val dq = q(i).toDouble - r
          acc += dq * dq
          i += 1
        }
        java.lang.Double.valueOf(acc)
      }: java.lang.Double
    }
    val qb = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val scored = encoded.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(qb)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dist", dist(col("codes"), col("__qv")))
      .filter(col("dist").isNotNull)
      .select("query_id", "neighbor_id", "dist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist", "rank")
  }

  /**
   * BINARY (1-bit) quantization signature: the sign bit of every
   * dimension, packed 32 bits per 64-bit word (32, not 64, because the
   * d25 oracle rule requires an external engine to replay the packing
   * and DuckDB's `<<` loud-fails on a shift INTO the sign bit). This is
   * the extreme point of the quantization family (SQ8 4×, PQ ~32×, BQ
   * 32× vs float32 with pure bit ops): the published sign-bit sketch
   * (Charikar's SimHash hyperplanes fixed to the axes) that modern
   * vector stores ship as "binary quantization" — Hamming distance
   * approximates angular distance, candidates scan with xor+popcount.
   *
   * Scale shape: the signature scan IS the index (a 100 TB corpus's
   * signatures are ~3 TB — a linear popcount scan per query batch, no
   * per-cell structure to maintain); compose with IVF cells (v03) when
   * even that scan is too much. `dim` must be a multiple of 32.
   */
  def bqSignature(vec: Column, dim: Int): Column = {
    require(dim % 32 == 0, s"bq: dim=$dim must be a multiple of 32")
    transform(sequence(lit(0), lit(dim / 32 - 1)), j =>
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) =>
        when(element_at(vec, j * 32 + b + 1) > 0f,
          acc.bitwiseOR(call_function("shiftleft", lit(1L), b)))
          .otherwise(acc)))
  }

  /** Hamming distance between two packed signatures: Σ popcount(xor). */
  def bqHamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      bit_count(x.bitwiseXOR(y)).cast("long")), lit(0L), (acc, v) => acc + v)

  /**
   * Exact-rank Hamming top-k over BQ signatures (the v12 gate): every
   * input is an integer bit op, ties break on neighbor_id, so the ranks
   * hash bit-for-bit against an oracle that replays the packing. The
   * broadcast query side makes the candidate pass one narrow signature
   * scan — the honest BQ serving shape (see [[bqSignature]]); follow
   * with an exact rerank of the shortlist when cosine ranks matter.
   *
   * Cost is corpus × |Q|: linear-in-corpus PER QUERY is the documented
   * BQ design (serving-sized query batches), but a caller passing a
   * large Q turns the scan quadratic-ish — `maxQueries` LOUD-fails that
   * instead of silently broadcasting it (the [[graft.ops.Robust.theilSen]]
   * contract: a silent cap would bias results, an OOM would be worse).
   * For bulk all-pairs work use the banded paths (Dedup.simhash / v03
   * IVF cells), not a serving scan.
   */
  def bqTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxQueries: Int = 4096): DataFrame = {
    require(maxQueries >= 1, s"maxQueries=$maxQueries must be >= 1")
    // bounded probe: limit(max+1) caps what the check itself can cost
    val nQ = queries.select(col(idCol)).limit(maxQueries + 1).count()
    require(nQ <= maxQueries,
      s"bqTopK: query set exceeds maxQueries=$maxQueries — the signature " +
        "scan is corpus x |Q| and the query side is broadcast; batch the " +
        "queries, raise the bound deliberately, or use the banded " +
        "near-dup/IVF paths for bulk all-pairs work")
    val sigs = corpus.select(col(idCol).as("neighbor_id"),
      bqSignature(col(vecCol), dim).as("__sig"))
    val qs = broadcast(queries.select(col(idCol).as("query_id"),
      bqSignature(col(vecCol), dim).as("__qsig")))
    val scored = sigs.crossJoin(qs)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        bqHamming(col("__sig"), col("__qsig")).as("hamming"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "hamming", "rank")
  }

  /**
   * TWO-STAGE retrieval — the production ANN serving shape: a cheap BQ
   * Hamming shortlist over the 32×-compressed signatures (stage 1, the
   * only pass that touches the whole corpus), then an EXACT cosine
   * rerank of the `shortlist` candidates (stage 2 — float vectors join
   * only shortlist×queries rows, output-bound). Same fold order as
   * [[Similarity.bruteForceTopK]], so the rerank is bit-identical to
   * the brute-force oracle over the same candidate set; ranks tie-break
   * on neighbor_id in both stages.
   */
  def bqRerankTopK(corpus: DataFrame, queries: DataFrame, dim: Int,
                   shortlist: Int, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   maxQueries: Int = 4096): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist=$shortlist >= k=$k >= 1")
    val cand = bqTopK(corpus, queries, dim, shortlist, idCol, vecCol, maxQueries)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), Similarity.normFast(col(vecCol)).as("__cn"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), Similarity.normFast(col(vecCol)).as("__qn")))
    val scored = cand.join(cv, "neighbor_id").join(qv, "query_id")
      .withColumn("cosine", Similarity.cosineFromParts(
        Similarity.dotFast(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
