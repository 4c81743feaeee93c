package graft

import org.apache.spark.sql.functions._

import graft.encode.Pca

/** PCA embedding compression: moments/covariance, the Jacobi
  * eigensolve, and the projection's geometry guarantees. */
class PcaSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  test("jacobi: hand-checked 2x2 and 3x3 eigensystems") {
    val (v2, e2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(v2.sorted.reverse.zip(Seq(3.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // eigenvector for lambda=3 is (1,1)/sqrt(2) up to sign
    val top = e2(v2.indexOf(v2.max))
    assert(math.abs(math.abs(top(0)) - math.abs(top(1))) < 1e-12)
    val m3 = Array(
      Array(4.0, 0.0, 0.0), Array(0.0, 1.0, 2.0), Array(0.0, 2.0, 1.0))
    val (v3, _) = Pca.jacobiEigen(m3)
    assert(v3.sorted.zip(Seq(-1.0, 3.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("covariance: matches the locally computed matrix") {
    val rows = Seq(
      Seq(1.0f, 2.0f, 0.0f), Seq(3.0f, 0.0f, 1.0f),
      Seq(5.0f, 4.0f, 2.0f), Seq(7.0f, 2.0f, 3.0f))
    val df = rows.map(Tuple1(_)).toDF("vector").repartition(3)
    val got = Pca.covariance(df, "vector", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = rows.length
    val local = Array.tabulate(3, 3) { (i, j) =>
      val mi = rows.map(_(i).toDouble).sum / n
      val mj = rows.map(_(j).toDouble).sum / n
      rows.map(r => r(i).toDouble * r(j).toDouble).sum / n - mi * mj
    }
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(got((i, j)) - local(i)(j)) < 1e-9, s"cov($i,$j)")
  }

  test("moments/train truncate vectors longer than dims (sequence(0, dims-1) contract)") {
    val rows = Seq(
      Seq(1.0f, 2.0f, 9.0f), Seq(3.0f, 0.0f, -9.0f),
      Seq(5.0f, 4.0f, 1.0f), Seq(7.0f, 2.0f, 50.0f))
    val df = rows.map(Tuple1(_)).toDF("vector").repartition(2)
    // dims=2 on 3-long vectors: the product pass must emit NO (i,j) >= 2
    // entry (pre-fusion the sequence(0, dims-1) chain truncated; the
    // fused kernel is bounded the same way, so train()'s dims-sized
    // mean/cov fill can't overflow)
    val m = Pca.moments(df, "vector", 2).collect()
    assert(m.forall(r => r.getInt(0) < 2 && r.getInt(1) < 2),
      "moments emitted an index beyond dims")
    assert(m.length === 3) // (0,0), (0,1), (1,1)
    val model = Pca.train(df, "vector", 2, 2)
    val df2 = rows.map(v => Tuple1(v.take(2))).toDF("vector")
    val model2 = Pca.train(df2, "vector", 2, 2)
    assert(model.mean.toSeq === model2.mean.toSeq)
    assert(model.eigenvalues.toSeq === model2.eigenvalues.toSeq)
  }

  test("train/project: orthonormal components, descending variance, subspace recovery") {
    // points in a 2-D plane inside 5-D (+ tiny jitter on one axis):
    // PCA-2 must recover the plane — projection preserves pairwise
    // distances, third eigenvalue collapses
    val pts = (0 until 40).map { i =>
      val a = (i % 8).toDouble; val b = (i / 8).toDouble
      Seq(a + b, 2 * a - b, a, b, 0.001 * (i % 3)).map(_.toFloat)
    }
    val df = pts.zipWithIndex.map { case (v, i) => (i.toString, v) }
      .toDF("id", "vector").repartition(4)
    val m = Pca.train(df, "vector", dims = 5, k = 3)
    // orthonormality
    for (r <- m.components.indices; s <- m.components.indices) {
      val dot = m.components(r).zip(m.components(s)).map { case (x, y) => x * y }.sum
      val want = if (r == s) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"comp$r . comp$s = $dot")
    }
    // eigenvalues descending, and the 3rd is the jitter axis (~0)
    assert(m.eigenvalues(0) >= m.eigenvalues(1))
    assert(m.eigenvalues(1) >= m.eigenvalues(2))
    assert(m.eigenvalues(2) < 1e-4)
    // pairwise distances preserved by the 2-D-dominant projection
    val proj = Pca.withProjection(df, "vector", m).select("id", "vector_pca")
      .collect().map(r => r.getString(0).toInt -> r.getSeq[Float](1)).toMap
    def d2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def dOrig(i: Int, j: Int) =
      pts(i).zip(pts(j)).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    for (i <- 0 until 10; j <- i + 1 until 10)
      assert(math.abs(d2(proj(i), proj(j)) - dOrig(i, j)) < 1e-3,
        s"pairwise distance drift at ($i,$j)")
    // per-component projection variance equals the eigenvalue
    val c0 = proj.values.map(_(0).toDouble).toSeq
    val mean0 = c0.sum / c0.size
    val var0 = c0.map(x => (x - mean0) * (x - mean0)).sum / c0.size
    assert(math.abs(var0 - m.eigenvalues(0)) < 1e-6)
  }

  test("corpus standardization: unit variance per dim, constant dims -> 0") {
    val rows = Seq(
      Seq(1.0f, 10.0f, 7.0f), Seq(3.0f, 20.0f, 7.0f),
      Seq(5.0f, 30.0f, 7.0f), Seq(7.0f, 40.0f, 7.0f))
    val df = rows.map(Tuple1(_)).toDF("vector").repartition(2)
    val (mean, std) = Pca.trainStandardizer(df, "vector", 3)
    assert(math.abs(mean(0) - 4.0) < 1e-12)
    assert(std(2) < 1e-9) // constant dim
    val z = df.select(Pca.standardizeColumn(col("vector"), mean, std).as("z"))
      .collect().map(_.getSeq[Double](0))
    // constant dim maps to 0 everywhere
    assert(z.forall(_(2) === 0.0))
    // per-dim mean 0, variance 1 after standardization
    for (d <- 0 to 1) {
      val vals = z.map(_(d))
      val m = vals.sum / vals.length
      val v = vals.map(x => (x - m) * (x - m)).sum / vals.length
      assert(math.abs(m) < 1e-12 && math.abs(v - 1.0) < 1e-9, s"dim $d")
    }
  }

  test("pca-then-search: top-1 neighbors survive compression on clustered data") {
    // 4 well-separated clusters in 16-D; PCA to 4 dims; each member's
    // nearest neighbor must stay inside its own cluster
    val rng = new scala.util.Random(7)
    val centers = Array.fill(4, 16)(rng.nextGaussian() * 5)
    val pts = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toString, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val df = pts.toDF("id", "vector").repartition(4)
    val m = Pca.train(df, "vector", dims = 16, k = 4)
    val proj = Pca.withProjection(df, "vector", m)
      .collect().map(r => r.getString(0).toInt -> r.getSeq[Float](2)).toMap
    def nn(i: Int): Int = proj.keys.filter(_ != i).minBy { j =>
      proj(i).zip(proj(j)).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    }
    (0 until 80).foreach(i => assert(nn(i) % 4 === i % 4,
      s"nearest of $i left its cluster after PCA"))
  }
}
