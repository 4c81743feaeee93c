package graft

import org.apache.spark.sql.functions._

import graft.ann.{AnisotropicPq, Pq}
import graft.core.{CollectionConfig, Metric}
import graft.search.Search

/** Anisotropic (score-aware) PQ: the eta=1 structural reduction to plain
  * PQ, the closed-form update, the training objective actually improving
  * over plain codebooks, and the family equivalence contract. */
class AnisotropicPqSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private val dims = 16
  private def mkRow(i: Int): (String, Seq[Float]) = {
    // three direction clusters with varied norms — the MIPS regime
    // anisotropy is built for (parallel error perturbs large scores)
    val base = i % 3
    val norm = 0.5f + (i % 7) * 0.5f
    val v = Array.tabulate(dims) { d =>
      val dir = if (d % 3 == base) 1.0 else 0.05
      (dir * norm * (1.0 + 0.03 * ((i * 31 + d * 17) % 11 - 5))).toFloat
    }
    (f"p$i%03d", v.toSeq)
  }
  private def corpus(n: Int) = (0 until n).map(mkRow).toDF("id", "vector")
    .withColumn("value", col("id"))
  private val config = CollectionConfig("apq", dims, Metric.InnerProduct,
    None, graft.core.ScoreMode.Similarity, "apq")
  private val pqCfg = Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 192)

  test("eta = 1 reduces to plain PQ codebooks bit-for-bit") {
    val df = corpus(200).cache()
    val plain = Pq.trainOrdered(df, config, pqCfg, col("id"))
    val aniso = AnisotropicPq.trainOrdered(df, config, pqCfg, col("id"), eta = 1.0)
    assert(plain.length === aniso.length)
    for (j <- plain.indices; c <- plain(j).indices)
      assert(java.util.Arrays.equals(plain(j)(c), aniso(j)(c)),
        s"codebook ($j, $c) differs under eta=1")
    df.unpersist()
  }

  test("closed-form update: a single point is its own centroid; solve is exact") {
    val one = Seq(("x", (1 to dims).map(_.toFloat / 4f))).toDF("id", "vector")
      .withColumn("value", col("id"))
    val cb = AnisotropicPq.trainOrdered(one, config,
      Pq.PqConfig(m = 4, k = 1, iterations = 2, sampleSize = 4), col("id"),
      eta = 4.0)
    val v = (1 to dims).map(_.toFloat / 4f).toArray
    val sub = dims / 4
    for (j <- 0 until 4; d <- 0 until sub)
      assert(math.abs(cb(j)(0)(d) - v(j * sub + d)) < 1e-5,
        s"k=1 centroid must be the point: subspace $j dim $d")
  }

  test("training objective: more iterations never hurt; anisotropic codebooks beat plain on anisotropic loss") {
    val df = corpus(192).cache()
    val sample = df.orderBy(col("id")).select("vector").limit(192)
      .collect().map(_.getSeq[Float](0).toArray)
    val sub = dims / pqCfg.m
    def slices(j: Int) = sample.map(v =>
      java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
    val eta = AnisotropicPq.etaFor(sub) max 3.0
    def totalLoss(cb: Array[Array[Array[Float]]]) =
      (0 until pqCfg.m).map(j => AnisotropicPq.meanLoss(slices(j), cb(j), eta)).sum
    val one = AnisotropicPq.trainOrdered(df, config,
      pqCfg.copy(iterations = 1), col("id"), eta = eta)
    val three = AnisotropicPq.trainOrdered(df, config, pqCfg, col("id"), eta = eta)
    assert(totalLoss(three) <= totalLoss(one) + 1e-9,
      "Lloyd's must not regress its own objective")
    // the point of the family: on ITS loss, the anisotropic codebook
    // wins over the plain-L2 one trained on the same sample
    val plain = Pq.trainOrdered(df, config, pqCfg, col("id"))
    assert(totalLoss(three) < totalLoss(plain),
      s"anisotropic training failed to beat plain codebooks on its objective")
    df.unpersist()
  }

  test("equivalence: candidates >= n == exact flat; partial candidates rank sanely") {
    val df = corpus(240).cache()
    val cb = AnisotropicPq.trainOrdered(df, config, pqCfg, col("id"))
    val q = Array.tabulate(dims)(d => if (d % 3 == 0) 1.0f else 0.05f)
    val exact = Search.flatSearch(df, config, q, 10)
      .select("id").collect().map(_.getString(0)).toSeq
    val full = Pq.search(df, config, cb, q, 10, candidates = 240,
      codesCol = "apq_codes")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(full === exact, "full-candidate anisotropic PQ must equal flat")
    val partial = Pq.search(df, config, cb, q, 10, candidates = 40,
      codesCol = "apq_codes")
      .select("id").collect().map(_.getString(0)).toSet
    assert(exact.toSet.intersect(partial).size >= 7,
      s"partial-candidate overlap collapsed: $partial vs $exact")
    df.unpersist()
  }

  test("score-aware payoff: anisotropic candidates recall >= plain PQ at the same code budget") {
    val df = corpus(360).cache()
    val plain = Pq.trainOrdered(df, config, pqCfg, col("id"))
    val aniso = AnisotropicPq.trainOrdered(df, config, pqCfg, col("id"))
    // average over several query directions; candidate sets BEFORE the
    // exact rerank are what the codebooks control, so compare at a tight
    // candidate budget where codebook quality is visible
    val overlaps = (0 until 6).map { qi =>
      val q = Array.tabulate(dims)(d =>
        (if (d % 3 == qi % 3) 1.0 else 0.05).toFloat * (1f + qi * 0.1f))
      val exact = Search.flatSearch(df, config, q, 10)
        .select("id").collect().map(_.getString(0)).toSet
      def ov(cb: Array[Array[Array[Float]]], codesCol: String) = {
        val got = Pq.search(df, config, cb, q, 10, candidates = 30,
          codesCol = codesCol).select("id").collect().map(_.getString(0)).toSet
        exact.intersect(got).size.toDouble / exact.size
      }
      (ov(aniso, "apq_codes"), ov(plain, "pq_codes"))
    }
    val (aSum, pSum) = overlaps.foldLeft((0.0, 0.0)) {
      case ((a, p), (ai, pi)) => (a + ai, p + pi)
    }
    assert(aSum >= pSum - 1e-9,
      s"anisotropic codebooks lost to plain PQ on MIPS recall: $aSum vs $pSum ($overlaps)")
    df.unpersist()
  }
}
