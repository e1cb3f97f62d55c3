package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import breeze.linalg.{svd => brzSvd}

/**
 * Optimized Product Quantization (OPQ; Ge, He, Ke & Sun, "Optimized Product
 * Quantization for Approximate Nearest Neighbor Search", CVPR 2013,
 * non-parametric variant): learn an orthogonal rotation `R` so that the
 * rotated vectors `y = R^T x` quantize with lower error under a product
 * quantizer — the rotation decorrelates dimensions and balances variance
 * across the `m` subspaces, which plain PQ cannot do when the embedding's
 * energy is concentrated in a few correlated directions.
 *
 * Training alternates (on the same bounded driver-side sample PQ training
 * uses — the heavy corpus never leaves the executors):
 *
 *  1. fix `R`: train PQ codebooks on the rotated sample (Lloyd's k-means);
 *  2. fix the codebooks: solve the orthogonal Procrustes problem
 *     `min_R ||X R − Ŷ||_F` — SVD of `XᵀŶ = U S Vᵀ`, update `R = U Vᵀ`
 *     (the reconstruction `Ŷ` is each rotated vector snapped to its
 *     codewords).
 *
 * Because `R` is orthogonal, L2 distances are preserved exactly
 * (`||Rᵀa − Rᵀb|| = ||a − b||`), so search is the UNCHANGED ADC machinery
 * ([[Quantization.adcTopK]]) run in the rotated space: rotate the corpus once
 * at encode time (narrow map), rotate each query once at search time.
 * The SVD runs on a dim × dim matrix on the driver (breeze, ships with
 * Spark MLlib) — microseconds next to the k-means sweep.
 */
object Opq {

  /** Orthogonal rotation (row-vector convention: `y = x · R`) + the PQ model
    * trained in the rotated space. */
  case class OpqModel(rotation: Array[Array[Double]], pq: Quantization.PqModel)

  private[llm] def rotateVec(x: Array[Double], r: Array[Array[Double]]): Array[Double] = {
    val dim = r.length
    val y = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val xi = if (i < x.length) x(i) else 0.0
      if (xi != 0.0) {
        val ri = r(i)
        var j = 0
        while (j < dim) { y(j) += xi * ri(j); j += 1 }
      }
      i += 1
    }
    y
  }

  /** Nearest-codeword reconstruction of a rotated vector. */
  private def reconstruct(y: Array[Double], pq: Quantization.PqModel): Array[Double] = {
    val out = new Array[Double](pq.dim)
    var j = 0
    while (j < pq.m) {
      val sub = java.util.Arrays.copyOfRange(y, j * pq.subDim, (j + 1) * pq.subDim)
      val cen = pq.codebooks(j)(Quantization.nearestCodeword(sub, pq.codebooks(j)))
      System.arraycopy(cen, 0, out, j * pq.subDim, pq.subDim)
      j += 1
    }
    out
  }

  /** Mean squared reconstruction error of the sample under (R, pq) — the
    * objective the alternation minimizes; exposed for tests/diagnostics. */
  private[llm] def reconstructionError(sample: Array[Array[Double]],
                                       model: OpqModel): Double = {
    val errs = sample.map { x =>
      val y = rotateVec(x, model.rotation)
      val yh = reconstruct(y, model.pq)
      var d = 0.0; var i = 0
      while (i < y.length) { val e = y(i) - yh(i); d += e * e; i += 1 }
      d
    }
    errs.sum / errs.length
  }

  /**
   * Train rotation + codebooks by `opqIterations` rounds of alternation.
   * Deterministic for fixed seeds. `R` starts at identity, so round 0
   * reproduces plain PQ and every Procrustes step can only reduce the
   * objective on the sample.
   */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
            sampleSize: Int = 2000, iterations: Int = 8, opqIterations: Int = 6,
            seed: Long = 42L, vecCol: String = "embedding"): OpqModel = {
    val sample = corpus.select(vecCol).limit(sampleSize).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty corpus")
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var pq: Quantization.PqModel = null
    (0 until math.max(1, opqIterations)).foreach { _ =>
      val rotated = sample.map(rotateVec(_, r))
      pq = Quantization.trainOnSample(rotated, dim, m, k, iterations, seed)
      // Procrustes update: M = Xᵀ Ŷ, R = U Vᵀ of its SVD
      val mMat = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      sample.zip(rotated).foreach { case (x, y) =>
        val yh = reconstruct(y, pq)
        var i = 0
        while (i < dim) {
          val xi = if (i < x.length) x(i) else 0.0
          if (xi != 0.0) {
            var j = 0
            while (j < dim) { mMat(i, j) += xi * yh(j); j += 1 }
          }
          i += 1
        }
      }
      val brzSvd.SVD(u, _, vt) = brzSvd(mMat)
      val rNew = u * vt
      r = Array.tabulate(dim, dim)((i, j) => rNew(i, j))
    }
    // final codebooks consistent with the final rotation
    pq = Quantization.trainOnSample(sample.map(rotateVec(_, r)), dim, m, k, iterations, seed)
    OpqModel(r, pq)
  }

  /** Rotate an embedding column (one narrow codegen-adjacent UDF pass) —
    * run once over the corpus before [[Quantization.encode]], and over the
    * query batch before [[Quantization.adcTopK]]. */
  def rotate(df: DataFrame, rotation: Array[Array[Double]],
             vecCol: String = "embedding", outCol: String = "rotated"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(rotation)
    val f = udf { (v: Array[Float]) =>
      if (v == null) null
      else rotateVec(v.map(_.toDouble), bc.value).map(_.toFloat)
    }
    df.withColumn(outCol, f(col(vecCol)))
  }

  /** OPQ ADC top-k: rotate queries into the trained space, then standard ADC
    * over codes produced by `encode(rotate(corpus))`. */
  def adcTopK(encodedRotated: DataFrame, queries: DataFrame, model: OpqModel,
              k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
              codeCol: String = "pq_code"): DataFrame = {
    val rq = rotate(queries, model.rotation, vecCol, outCol = "__rq")
      .select(col(idCol), col("__rq"))
    Quantization.adcTopK(encodedRotated, rq, model.pq, k,
      idCol = idCol, vecCol = "__rq", codeCol = codeCol)
  }
}
