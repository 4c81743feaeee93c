package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form ridge regression (a linear probe) over an embedding
  * column — the embedding-based QUALITY SCORER shape of modern data
  * curation (FineWeb-Edu style: a teacher labels a sample of documents,
  * a linear head on frozen embeddings distills the judgment, the probe
  * scores the full corpus and a threshold cuts it). The engine's other
  * quality paths are heuristic (Gopher), generative (bigram-LM
  * perplexity) or token-count-based (Naive Bayes); this is the learned
  * embedding-space one.
  *
  * Scale shape (the same contract as [[Pca]]): training is ONE
  * distributed moments job over the augmented vector `[x, 1, y]` —
  * normal-equation sums `X^T X` (upper triangle) and `X^T y` as a
  * (d+2)^2/2-row aggregate, nothing per-row ever reaches the driver —
  * followed by a driver-side O(d^3) Gaussian elimination of the
  * (d+1)-dim system. Scoring is a pure codegen'd HOF fold
  * (`aggregate(zip_with(...))`), composable with every search/dedup
  * operator and usable unchanged under Structured Streaming.
  *
  * Solves `(X^T X + lambda I) w = X^T y` (intercept column, when
  * fitted, is not regularized). `lambda` is absolute, not scaled by n —
  * the DuckDB oracle replicates the exact arithmetic.
  */
object LinearProbe {

  /** Fitted probe: `score(x) = dot(weights, x) + intercept`. */
  final case class Model(weights: Array[Double], intercept: Double,
      lambda: Double)

  /** Fit on `(vectorCol: array<float|double>, label: double)` rows.
    * One moments job; driver work is the (d+1)^3 solve. */
  def train(df: DataFrame, vectorCol: String, label: Column, dims: Int,
      lambda: Double = 1e-3, fitIntercept: Boolean = true): Model = {
    require(dims >= 1, "dims must be positive")
    require(lambda >= 0, "lambda must be non-negative")
    val p = if (fitIntercept) dims + 1 else dims
    val xs = transform(col(vectorCol), x => x.cast("double"))
    val aug = if (fitIntercept) concat(xs, array(lit(1.0d))) else xs
    val z = concat(aug, array(label.cast("double")))
    val rows = Pca.moments(df.select(z.as("_z")), "_z", p + 1).collect()
    val a = Array.ofDim[Double](p, p)
    val b = new Array[Double](p)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val s = r.getDouble(r.fieldIndex("sum_ij"))
      if (j < p) { a(i)(j) = s; a(j)(i) = s }
      else if (i < p) b(i) = s
      // (i = j = p) is sum(y^2): not needed for the solve
    }
    var i = 0
    while (i < dims) { a(i)(i) += lambda; i += 1 } // intercept unregularized
    val w = solve(a, b)
    Model(w.take(dims), if (fitIntercept) w(dims) else 0.0, lambda)
  }

  /** Logistic probe (binary labels in {0,1}) via IRLS/Newton — the
    * CLASSIFIER form of the quality scorer (a FineWeb-Edu teacher says
    * keep/drop, not a regression target). Each iteration is ONE
    * distributed moments job: the weighted Hessian `X^T W X` and the
    * gradient `X^T (y - p)` both fall out of the second moments of the
    * augmented vector `[sqrt(w) * z, (y - p) / sqrt(w)]` (the cross
    * terms telescope the 1/sqrt(w) away), so Newton costs exactly what
    * ridge training costs, `iterations` times. Fixed iteration count
    * keeps the result deterministic; ridge `lambda` bounds the weights
    * on separable data (where unregularized logistic diverges).
    * [[scoreColumn]] then yields the LOGIT — threshold at 0 for the
    * 0.5-probability cut, or apply sigmoid for calibrated scores. */
  def trainLogistic(df: DataFrame, vectorCol: String, label: Column,
      dims: Int, lambda: Double = 1e-3, fitIntercept: Boolean = true,
      iterations: Int = 8): Model = {
    require(dims >= 1, "dims must be positive")
    require(lambda >= 0, "lambda must be non-negative")
    require(iterations >= 1, "iterations must be positive")
    val p = if (fitIntercept) dims + 1 else dims
    var model = Model(new Array[Double](dims), 0.0, lambda)
    var it = 0
    while (it < iterations) {
      val eta = scoreColumn(col(vectorCol), model)
      val prob = lit(1.0) / (lit(1.0) + exp(-eta))
      // floor the IRLS weight so saturated rows (p near 0/1) neither
      // divide by zero nor vanish from the Hessian
      val wgt = greatest(prob * (lit(1.0) - prob), lit(1e-6))
      val resid = label.cast("double") - prob
      val xs = transform(col(vectorCol), x => x.cast("double"))
      val zBase = if (fitIntercept) concat(xs, array(lit(1.0d))) else xs
      val zz = concat(
        transform(zBase, zi => zi * sqrt(wgt)),
        array(resid / sqrt(wgt)))
      val rows = Pca.moments(df.select(zz.as("_z")), "_z", p + 1).collect()
      val h = Array.ofDim[Double](p, p)
      val g = new Array[Double](p)
      rows.foreach { r =>
        val i = r.getInt(0); val j = r.getInt(1)
        val s = r.getDouble(r.fieldIndex("sum_ij"))
        if (j < p) { h(i)(j) = s; h(j)(i) = s }
        else if (i < p) g(i) = s
      }
      // L2-regularized Newton: (H + lambda I) step = g - lambda w,
      // intercept unregularized on both sides
      var i = 0
      while (i < dims) {
        h(i)(i) += lambda
        g(i) -= lambda * model.weights(i)
        i += 1
      }
      val step = solve(h, g)
      model = Model(
        Array.tabulate(dims)(k => model.weights(k) + step(k)),
        if (fitIntercept) model.intercept + step(dims) else 0.0, lambda)
      it += 1
    }
    model
  }

  /** Probe score as a codegen'd fold: `dot(w, x) + intercept`, all-f64. */
  def scoreColumn(vec: Column, model: Model): Column =
    aggregate(
      zip_with(vec, typedlit(model.weights), (x, w) => x.cast("double") * w),
      lit(model.intercept), (acc, t) => acc + t)

  /** The curation cut: rows whose probe score meets `minScore` — the
    * FineWeb-Edu "educational value >= threshold" gate as one filter. */
  def thresholdCut(df: DataFrame, vectorCol: String, model: Model,
      minScore: Double): DataFrame =
    df.filter(scoreColumn(col(vectorCol), model) >= lit(minScore))

  /** Keep the top `keepFraction` of rows by probe score — the relative
    * form of [[thresholdCut]] when the budget is a data FRACTION, not a
    * score bar. The cutoff is the EXACT corpus order statistic
    * (distributed zipWithIndex over the score-sorted frame, the same
    * machinery as the LM perplexity-median gate — no approximate
    * quantile sketch whose error would make the kept set
    * irreproducible). Ties at the cutoff score all survive, so the
    * result is deterministic regardless of partitioning; empty input
    * passes through. */
  def quantileCut(df: DataFrame, vectorCol: String, model: Model,
      keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    val scored = df.withColumn("_probe_score",
      scoreColumn(col(vectorCol), model))
    val n = scored.count()
    if (n == 0) return df
    val keep = math.max(1L, math.ceil(n * keepFraction).toLong)
    // the keep-th HIGHEST score = order statistic n - keep ascending
    val cutoff = graft.functions.Sampling.withSequentialIds(
        scored.select(col("_probe_score")), col("_probe_score"))
      .filter(col("seq_id") === (n - keep))
      .select(col("_probe_score")).head.getDouble(0)
    scored.filter(col("_probe_score") >= cutoff).drop("_probe_score")
  }

  /** Gaussian elimination with partial pivoting (driver-side, p <= a
    * few thousand — the probe dimension, never the corpus). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val p = b.length
    val m = Array.tabulate(p)(i => a(i) :+ b(i))
    var c = 0
    while (c < p) {
      var piv = c
      var r = c + 1
      while (r < p) { if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r; r += 1 }
      require(math.abs(m(piv)(c)) > 1e-12,
        s"singular normal equations at column $c — raise lambda")
      val t = m(c); m(c) = m(piv); m(piv) = t
      r = c + 1
      while (r < p) {
        val f = m(r)(c) / m(c)(c)
        if (f != 0.0) { var k = c; while (k <= p) { m(r)(k) -= f * m(c)(k); k += 1 } }
        r += 1
      }
      c += 1
    }
    val w = new Array[Double](p)
    var i = p - 1
    while (i >= 0) {
      var s = m(i)(p)
      var k = i + 1
      while (k < p) { s -= m(i)(k) * w(k); k += 1 }
      w(i) = s / m(i)(i)
      i -= 1
    }
    w
  }
}
