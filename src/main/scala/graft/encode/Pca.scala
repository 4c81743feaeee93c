package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the classic dimensionality-reduction
  * pass before indexing (half the dims ≈ half the scan bytes and ADC
  * work; FAISS ships the same composition as `PCAR` + index). Two
  * cleanly separated stages:
  *
  *  1. DISTRIBUTED moment collection: one aggregation producing the
  *     d-vector of sums and the upper-triangular d x d sum of products
  *     (flattened row-major, a pure codegen'd HOF projection +
  *     groupBy(idx) — no joins, no per-row Python/UDF). Covariance
  *     follows by the computational formula `E[xy] - E[x]E[y]`. Like
  *     IVF/PQ training, fit on a deterministic sample at 100 TB — the
  *     moments job is O(rows x d^2/2), the model is corpus-rate-free.
  *  2. DRIVER eigensolve on the d x d covariance (cyclic Jacobi, fixed
  *     sweep order — deterministic for a given matrix; d is model
  *     dimension, never corpus size).
  *
  * Projection is a per-row HOF fold over the centered vector per kept
  * component — codegen'd, shuffle-free, composable with every index in
  * the engine (the PCA-then-index pipeline).
  */
object Pca {

  /** Trained model: `mean` (d), `components` (k rows x d, orthonormal,
    * by descending eigenvalue), `eigenvalues` (k, the per-component
    * explained variance). */
  case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Upper-triangular second-moment frame: (i, j, n, sum_i, sum_j,
    * sum_ij) for i <= j — the single-pass moments the covariance
    * derives from. Exposed for the oracle gate. */
  def moments(df: DataFrame, vectorCol: String, dims: Int): DataFrame = {
    // fused per-row product array (graft.expr.TriProducts): the nested
    // transform/sequence/struct chain this replaces is CodegenFallback,
    // interpreted once per (i, j) pair — dims*(dims+1)/2 closures per
    // row; element order (and so every downstream sum's accumulation
    // order) is identical
    val tri = org.apache.spark.sql.graft.Bridge.column(
      graft.expr.TriProducts(
        org.apache.spark.sql.graft.Bridge.expression(col(vectorCol)), dims))
    val sums = df.select(posexplode(col(vectorCol)))
      .groupBy(col("pos").as("i")).agg(
        count(lit(1)).as("n"), sum(col("col").cast("double")).as("s"))
    df.select(explode(tri).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("sum_ij"))
      .join(sums.select(col("i"), col("n"), col("s").as("sum_i")), "i")
      .join(sums.select(col("i").as("j"), col("s").as("sum_j")), "j")
      .select(col("i"), col("j"), col("n"), col("sum_i"), col("sum_j"),
        col("sum_ij"))
  }

  /** Covariance entries (i, j, cov) for i <= j via
    * `sum_ij/n - (sum_i/n)(sum_j/n)`. */
  def covariance(df: DataFrame, vectorCol: String, dims: Int): DataFrame =
    moments(df, vectorCol, dims).select(col("i"), col("j"),
      (col("sum_ij") / col("n").cast("double") -
        (col("sum_i") / col("n").cast("double")) *
        (col("sum_j") / col("n").cast("double"))).as("cov"))

  /** Fit the top-`k` components. One distributed moments job, then a
    * driver-side Jacobi eigensolve of the d x d covariance. */
  def train(df: DataFrame, vectorCol: String, dims: Int, k: Int): Model = {
    require(k >= 1 && k <= dims, s"k must be in [1, $dims]")
    val rows = moments(df, vectorCol, dims).collect()
    val n = rows.head.getLong(rows.head.fieldIndex("n")).toDouble
    val mean = new Array[Double](dims)
    val cov = Array.ofDim[Double](dims, dims)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      if (i == j) mean(i) = r.getDouble(3) / n
      val c = r.getDouble(5) / n - (r.getDouble(3) / n) * (r.getDouble(4) / n)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (values, vectors) = jacobiEigen(cov)
    // sort by descending eigenvalue, ties by original index for determinism
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    Model(mean, order.map(vectors(_)).toArray, order.map(values(_)).toArray)
  }

  /** Projection column: `array<float>` of length k, component r =
    * dot(x - mean, components(r)). Model rides as plan literals (k x d
    * doubles — small next to the ADC tables the engine already
    * plan-folds). */
  def projectColumn(vectorCol: Column, model: Model): Column = {
    val d = model.mean.length
    val meanLit = typedLit(model.mean.toSeq)
    val comps = model.components.map { comp =>
      val compLit = typedLit(comp.toSeq)
      aggregate(sequence(lit(0), lit(d - 1)), lit(0.0), (acc, i) =>
        acc + (element_at(vectorCol, i + 1).cast("double") -
          element_at(meanLit, i + 1)) *
          element_at(compLit, i + 1))
        .cast("float")
    }
    array(comps: _*)
  }

  /** `df` with `outCol` = the k-dim projection of `vectorCol`. */
  def withProjection(df: DataFrame, vectorCol: String, model: Model,
      outCol: String = "vector_pca"): DataFrame =
    df.withColumn(outCol, projectColumn(col(vectorCol), model))

  // -------------------------------- corpus-level standardization

  /** Per-dimension corpus statistics (i, n, s, ss) — the diagonal-only
    * sibling of [[moments]] (O(d) per row, not O(d^2)). */
  def dimStats(df: DataFrame, vectorCol: String): DataFrame =
    df.select(posexplode(col(vectorCol)))
      .groupBy(col("pos").as("i")).agg(
        count(lit(1)).as("n"),
        sum(col("col").cast("double")).as("s"),
        sum(col("col").cast("double") * col("col").cast("double")).as("ss"))

  /** Fit corpus z-score parameters: per-dim (mean, std) via
    * `ss/n - (s/n)^2`. A bounded d-row collect, like every model fit
    * here. */
  def trainStandardizer(df: DataFrame, vectorCol: String,
      dims: Int): (Array[Double], Array[Double]) = {
    val mean = new Array[Double](dims)
    val std = new Array[Double](dims)
    dimStats(df, vectorCol).collect().foreach { r =>
      val i = r.getInt(0); val n = r.getLong(1).toDouble
      val m = r.getDouble(2) / n
      mean(i) = m
      std(i) = math.sqrt(r.getDouble(3) / n - m * m)
    }
    (mean, std)
  }

  /** CORPUS z-score of a vector column — (x_d - mean_d) / std_d per
    * dimension, constant dims (std 0) map to 0. Unlike the per-vector
    * `Normalize.ZScore` mode this standardizes ACROSS the corpus: the
    * preprocessing quantizers want when dimensions have wildly
    * different scales (balanced per-dim variance is what SQ8's affine
    * grid and PQ's subspace k-means assume). A pure codegen'd HOF —
    * no shuffle, composable with every index. */
  def standardizeColumn(vectorCol: Column, mean: Array[Double],
      std: Array[Double]): Column = {
    val meanLit = typedLit(mean.toSeq)
    val stdLit = typedLit(std.toSeq)
    transform(vectorCol, (x, i) =>
      when(element_at(stdLit, i + 1) > 0,
        (x.cast("double") - element_at(meanLit, i + 1)) /
          element_at(stdLit, i + 1))
        .otherwise(lit(0.0)))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix (the classical
    * rotate-away-the-largest-off-diagonals sweep with the standard
    * tau-form updates): fixed (p, q) sweep order — deterministic for a
    * given input. Returns (eigenvalues, eigenvectors as rows). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < maxSweeps && offDiag(a) > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = 0.5 * (a(q)(q) - a(p)(p)) / apq
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val tau = s / (1.0 + c)
            val h = t * apq
            a(p)(p) -= h; a(q)(q) += h
            a(p)(q) = 0.0; a(q)(p) = 0.0
            def rot(m: Array[Array[Double]], i1: Int, j1: Int, i2: Int, j2: Int): Unit = {
              val g = m(i1)(j1); val hh = m(i2)(j2)
              m(i1)(j1) = g - s * (hh + g * tau)
              m(i2)(j2) = hh + s * (g - hh * tau)
            }
            var k = 0
            while (k < p) { rot(a, k, p, k, q); k += 1 }
            k = p + 1
            while (k < q) { rot(a, p, k, k, q); k += 1 }
            k = q + 1
            while (k < d) { rot(a, p, k, q, k); k += 1 }
            k = 0
            while (k < d) { rot(v, k, p, k, q); k += 1 }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val values = Array.tabulate(d)(i => a(i)(i))
    val vectors = Array.tabulate(d)(j => Array.tabulate(d)(i => v(i)(j)))
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
