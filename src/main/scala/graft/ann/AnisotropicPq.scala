package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.expr.VectorKernels

/** Anisotropic (score-aware) product quantization — the codebook loss of
  * Guo et al., "Accelerating Large-Scale Inference with Anisotropic
  * Vector Quantization" (ICML 2020; the quantization inside Google's
  * ScaNN): quantization error PARALLEL to the datapoint costs more than
  * orthogonal error, because for MIPS/cosine ranking the parallel
  * component is what perturbs high scores. Loss per point
  * `L(x, c) = eta * ||r_par||^2 + ||r_orth||^2` with `r = x - c`,
  * `r_par = (r . x_hat) x_hat`, equivalently
  * `L = ||r||^2 + (eta - 1) (r . x_hat)^2`.
  *
  * Training is Lloyd's with the anisotropic pieces swapped in:
  *  - assignment: argmin of `L` (first-min tie-break, like
  *    [[IvfIndex.nearestCentroid]]);
  *  - update: the closed-form weighted solve (paper Thm 4.2)
  *    `[ n I + (eta-1) sum x_hat x_hat^T ] c = sum x + (eta-1) sum ||x|| x_hat`
  *    — a sub-dim x sub-dim Gaussian-elimination solve per centroid.
  *
  * Applied per PQ subspace with the SUBVECTOR direction as the
  * anisotropy axis (the decoupled form; the paper's full-vector coupling
  * ties subspaces together and buys little once vectors are
  * unit-normalized — documented deviation). `eta = 1` recovers PLAIN
  * L2 k-means bit-for-bit (same init, ties, empty-cluster reseed, mean
  * arithmetic as [[IvfIndex.lloydKMeans]]) — the structural reduction
  * the oracle row gates; `eta` above 1 trades orthogonal error for
  * parallel fidelity. Default eta follows the paper's T = 0.2 threshold
  * recipe: `eta = (d_sub - 1) T^2 / (1 - T^2)`.
  *
  * Everything downstream of training — encode, ADC tables, candidate
  * cut, exact rerank, batch form, at-rest layout — is [[Pq]] verbatim:
  * the codebooks are the only thing anisotropy changes.
  */
object AnisotropicPq {

  /** The paper's threshold-to-eta recipe (T in (0,1)). */
  def etaFor(subDims: Int, threshold: Double = 0.2): Double = {
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0,1)")
    math.max(1.0, (subDims - 1) * threshold * threshold /
      (1.0 - threshold * threshold))
  }

  /** Anisotropic codebooks, same shape/contract as [[Pq.trainOrdered]]:
    * codebooks(j)(c) is centroid c of subspace j. `eta = 1` returns
    * exactly what [[Pq.trainOrdered]] returns on the same sample. */
  def trainOrdered(df: DataFrame, config: CollectionConfig, pq: Pq.PqConfig,
      order: Column, eta: Double = -1.0,
      vectorCol: String = "vector"): Array[Array[Array[Float]]] = {
    require(config.dimensions % pq.m == 0,
      s"dims ${config.dimensions} not divisible by m=${pq.m}")
    require(pq.k <= 256, "PQ codes are one byte: k must be <= 256")
    val sub = config.dimensions / pq.m
    val effEta = if (eta > 0.0) eta else etaFor(sub)
    require(effEta >= 1.0, s"eta must be >= 1 (got $effEta)")
    val sample = df.orderBy(order).select(vectorCol)
      .limit(pq.sampleSize).collect().map(_.getSeq[Float](0).toArray)
    Pq.parSubspaces(pq.m) { j =>
      val slices = sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      anisotropicKMeans(slices, sub, pq.k, pq.iterations, effEta)
    }
  }

  /** `L(x, c) = ||x - c||^2 + (eta-1) ((x - c) . x_hat)^2`; zero-norm
    * points have no direction and fall back to plain L2. */
  def anisotropicLoss(x: Array[Float], c: Array[Float], eta: Double): Double = {
    val l2 = VectorKernels.distance(1, x, c) // squared L2
    if (eta == 1.0) return l2
    var norm2 = 0.0
    var rDotX = 0.0
    var i = 0
    while (i < x.length) {
      norm2 += x(i).toDouble * x(i)
      rDotX += (x(i).toDouble - c(i)) * x(i)
      i += 1
    }
    if (norm2 == 0.0) l2
    else l2 + (eta - 1.0) * (rDotX * rDotX) / norm2
  }

  private def nearestAnisotropic(x: Array[Float],
      centroids: Array[Array[Float]], eta: Double): Int = {
    var best = 0
    var bestLoss = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val l = anisotropicLoss(x, centroids(c), eta)
      if (l < bestLoss) { bestLoss = l; best = c }
      c += 1
    }
    best
  }

  /** Lloyd's with the anisotropic assignment + closed-form update. The
    * eta = 1 path IS [[IvfIndex.lloydKMeans]] (identical init, ties,
    * reseed, mean arithmetic) — the reduction the spec and oracle pin. */
  private[ann] def anisotropicKMeans(sample: Array[Array[Float]], dims: Int,
      k0: Int, iterations: Int, eta: Double): Array[Array[Float]] = {
    require(sample.nonEmpty, "cannot train on an empty sample")
    if (eta == 1.0) return IvfIndex.lloydKMeans(sample, dims, k0, iterations)
    val k = math.min(k0, sample.length)
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    var iter = 0
    while (iter < iterations) {
      // per-centroid accumulators of the normal equations
      // [ n I + (eta-1) sum x_hat x_hat^T ] c = sum x + (eta-1) sum x_hat (x_hat . x)
      // and x_hat (x_hat . x) = x, so the right side is just eta * sum x
      // (zero-norm points contribute plain x to both sides)
      val mats = Array.fill(k)(new Array[Double](dims * dims))
      val rhs = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestAnisotropic(v, centroids, eta)
        counts(c) += 1
        var norm2 = 0.0
        var i = 0
        while (i < dims) { norm2 += v(i).toDouble * v(i); i += 1 }
        val b = rhs(c)
        if (norm2 == 0.0) {
          i = 0
          while (i < dims) { b(i) += v(i); i += 1 }
        } else {
          val w = (eta - 1.0) / norm2 // (eta-1) x_hat x_hat^T = w * x x^T
          val a = mats(c)
          i = 0
          while (i < dims) {
            val vi = v(i).toDouble
            b(i) += eta * vi
            var jj = 0
            while (jj < dims) { a(i * dims + jj) += w * vi * v(jj); jj += 1 }
            i += 1
          }
        }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) sample((c * 7919) % sample.length).clone()
        else {
          val a = mats(c)
          var i = 0
          while (i < dims) { a(i * dims + i) += counts(c); i += 1 }
          solveInPlace(a, rhs(c), dims).map(_.toFloat)
        }
      }
      iter += 1
    }
    centroids
  }

  /** Gaussian elimination with partial pivoting; a is row-major n x n,
    * both a and b are consumed. The system is symmetric positive
    * definite by construction (n I + PSD), so it is always solvable. */
  private def solveInPlace(a: Array[Double], b: Array[Double], n: Int): Array[Double] = {
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) {
        if (math.abs(a(r * n + col)) > math.abs(a(piv * n + col))) piv = r
        r += 1
      }
      if (piv != col) {
        var j = 0
        while (j < n) {
          val t = a(col * n + j); a(col * n + j) = a(piv * n + j); a(piv * n + j) = t
          j += 1
        }
        val t = b(col); b(col) = b(piv); b(piv) = t
      }
      val d = a(col * n + col)
      r = col + 1
      while (r < n) {
        val f = a(r * n + col) / d
        if (f != 0.0) {
          var j = col
          while (j < n) { a(r * n + j) -= f * a(col * n + j); j += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i * n + j) * x(j); j += 1 }
      x(i) = s / a(i * n + i)
      i -= 1
    }
    x
  }

  /** Mean anisotropic loss of a codebook over a sample — the training
    * objective, exposed for the monotone-improvement gate. */
  def meanLoss(sample: Array[Array[Float]],
      codebooks: Array[Array[Float]], eta: Double): Double = {
    var s = 0.0
    sample.foreach { v =>
      s += anisotropicLoss(v, codebooks(nearestAnisotropic(v, codebooks, eta)), eta)
    }
    s / sample.length
  }
}
