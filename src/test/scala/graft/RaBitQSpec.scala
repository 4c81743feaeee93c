package graft

import org.apache.spark.sql.functions._

import graft.ann.{ModelStore, RaBitQ}
import graft.core.{CollectionConfig, Metric}
import graft.prepare.Prepare
import graft.search.Search

/** RaBitQ calibrated binary quantization: rotation invariants, encode
  * contracts, estimator quality vs the raw sign-bit pass, equivalence
  * to exact flat search at full candidates, batch == single, and the
  * model sidecar round trip. */
class RaBitQSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  private def prep(rows: Seq[(String, Array[Float])], config: CollectionConfig) =
    Prepare.prepareEmbeddings(embeddingRows(rows), config)

  private def detVec(i: Int, d: Int): Array[Float] =
    Array.tabulate(d)(j => math.sin(i * 1.7 + j * 0.61).toFloat +
      (if (j % 3 == 0) 0.4f * i % 5 else 0.0f))

  test("rotation is orthonormal: norms preserved, fht == ordered to 1e-9") {
    val cfg = RaBitQ.Config(dims = 48, rounds = 2, seed = 11L) // pads to 64
    val m = RaBitQ.Model(cfg, new Array[Double](48))
    val mFht = RaBitQ.Model(cfg.copy(ordered = false), new Array[Double](48))
    for (i <- 0 until 8) {
      val v = detVec(i, 48)
      val n0 = math.sqrt(v.map(x => x.toDouble * x).sum)
      val r = RaBitQ.rotateResidual(v, m)
      assert(r.length === 64)
      val n1 = math.sqrt(r.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-9, s"norm not preserved: $n0 vs $n1")
      val rf = RaBitQ.rotateResidual(v, mFht)
      r.zip(rf).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("encode: factors match the rotated residual; centered oc = <v,c>") {
    val cfg = RaBitQ.Config(dims = 32, seed = 3L, centered = true)
    val rows = (0 until 40).map(i => (f"id-$i%02d", detVec(i, 32)))
    val df = embeddingRows(rows).withColumnRenamed("id", "id")
    val m = RaBitQ.train(df, cfg)
    // centroid really is the mean
    val mean = Array.tabulate(32)(d => rows.map(_._2(d).toDouble).sum / rows.size)
    m.centroid.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    val v = rows.head._2
    val (codes, rnorm, sabs, oc) = RaBitQ.encodeVec(v, m)
    val r = RaBitQ.rotateResidual(v, m)
    assert(math.abs(rnorm - math.sqrt(r.map(x => x * x).sum)) < 1e-12)
    assert(math.abs(sabs - r.map(math.abs).sum) < 1e-12)
    assert(math.abs(oc - v.zip(m.centroid).map { case (x, c) => x * c }.sum) < 1e-9)
    r.zipWithIndex.foreach { case (x, i) =>
      val bit = (codes(i >>> 6) & (1L << (i & 63))) != 0L
      assert(bit === (x >= 0.0), s"bit $i")
    }
  }

  test("estimator: mean |est - true| L2^2 error beats prior-only on random data") {
    val d = 64
    val cfg = RaBitQ.Config(dims = d, seed = 5L)
    val m = RaBitQ.Model(cfg, new Array[Double](d))
    val q = detVec(99, d)
    val qp = RaBitQ.prepareQueryRot(m, q)
    var estErr = 0.0
    var priorErr = 0.0
    val n = 80
    for (i <- 0 until n) {
      val v = detVec(i, d)
      val (codes, rnorm, sabs, oc) = RaBitQ.encodeVec(v, m)
      val est = RaBitQ.rankBits(codes, rnorm, sabs, oc, qp.qhat, qp.nqr, qp.qc, m.cc, 0)
      val truth = v.zip(q).map { case (a, b) => val t = a.toDouble - b; t * t }.sum
      estErr += math.abs(est - truth)
      // "prior-only": the norms-only guess with e = 0 (what you know
      // WITHOUT the bits) — the calibrated bits must beat it clearly
      priorErr += math.abs((qp.nqr * qp.nqr + rnorm * rnorm) - truth)
    }
    assert(estErr < 0.5 * priorErr,
      s"estimator not informative: est=$estErr prior=$priorErr")
  }

  test("equivalence: candidates = n degenerates to exact flat (l2/cosine/ip/nip)") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.InnerProduct,
        Metric.NegativeInnerProduct)) {
      val config = CollectionConfig("rq", 24, metric)
      val coll = prep((0 until 64).map(i => (f"id-$i%02d", detVec(i, 24))), config).cache()
      val m = RaBitQ.train(coll, RaBitQ.Config(dims = 24, centered = true))
      val q = detVec(77, 24)
      val exact = Search.flatSearch(coll, config, q, 10).collect()
        .map(r => (r.getString(0), r.getDouble(2)))
      val rq = RaBitQ.search(RaBitQ.withCodes(coll, m), config, m, q, 10,
        candidates = 64).collect().map(r => (r.getString(0), r.getDouble(2)))
      assert(rq.toSeq === exact.toSeq, s"metric ${metric.name}")
      coll.unpersist()
    }
  }

  test("recall on real embeddings: candidate cut beats the raw sign-bit pass") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val m = RaBitQ.train(coll, RaBitQ.Config(dims = d, centered = true))
    val coded = RaBitQ.withCodes(coll, m).cache()
    coded.count()
    val overlaps = (0L until 5L).map { qi =>
      val q = Tables.queryVector(spark, sfDir, qi)
      val exact = Search.flatSearch(coll, config, q, 10).collect().map(_.getString(0)).toSet
      val rq = RaBitQ.search(coded, config, m, q, 10, candidates = 30)
        .collect().map(_.getString(0)).toSet
      val sign = Search.quantizedSearch(coll, config, q, 10, candidates = 30)
        .collect().map(_.getString(0)).toSet
      ((exact & rq).size, (exact & sign).size)
    }
    val rqHits = overlaps.map(_._1).sum
    val signHits = overlaps.map(_._2).sum
    assert(rqHits >= signHits,
      s"calibrated bits lost to raw sign bits: $rqHits vs $signHits")
    assert(rqHits >= 40, s"recall too low: $rqHits/50")
    coded.unpersist(); coll.unpersist()
  }

  test("batch == single per query; empty query frame -> empty typed result") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val m = RaBitQ.train(coll, RaBitQ.Config(dims = d))
    val coded = RaBitQ.withCodes(coll, m).cache()
    coded.count()
    val qs = Tables.read(spark, sfDir, "embeddings").filter(col("vec_id") < 4)
      .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
    val batch = RaBitQ.searchMany(coded, config, m, qs, 5, candidates = 30,
      knownNq = 4L).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r =>
        (r.getString(1), r.getDouble(3))).sortBy(r => (-r._2, r._1))).toMap
    for (qi <- 0L until 4L) {
      val q = Tables.queryVector(spark, sfDir, qi)
      val single = RaBitQ.search(coded, config, m, q, 5, candidates = 30)
        .collect().map(r => (r.getString(0), r.getDouble(2)))
      assert(batch(qi.toString).toSeq === single.toSeq, s"query $qi")
    }
    val empty = RaBitQ.searchMany(coded, config, m, qs.limit(0), 5,
      candidates = 30, knownNq = 0L)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq ===
      Seq("qid", "id", "value", "score", "distance", "metric"))
    coded.unpersist(); coll.unpersist()
  }

  test("model sidecar round trip: loaded model searches identically") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val m = RaBitQ.train(coll, RaBitQ.Config(dims = d, rounds = 2,
      seed = 19L, centered = true, ordered = false))
    val dir = java.nio.file.Files.createTempDirectory("rabitq-model").toString
    val path = dir + "/_graft_model.json"
    ModelStore.saveRabitq(spark, path, m)
    val loaded = ModelStore.loadRabitq(spark, path)
    assert(loaded.config === m.config)
    assert(loaded.centroid.toSeq === m.centroid.toSeq)
    val q = Tables.queryVector(spark, sfDir, 1L)
    val a = RaBitQ.search(RaBitQ.withCodes(coll, m), config, m, q, 10, candidates = 40)
      .collect().map(_.getString(0)).toSeq
    val b = RaBitQ.search(RaBitQ.withCodes(coll, loaded), config, loaded, q, 10,
      candidates = 40).collect().map(_.getString(0)).toSeq
    assert(a === b)
    coll.unpersist()
  }

  test("zero-residual edges: zero query and zero row rank deterministically") {
    val config = CollectionConfig("rq", 8, Metric.L2)
    val rows = ("zero", Array.fill(8)(0.0f)) +:
      (0 until 20).map(i => (f"id-$i%02d", detVec(i, 8)))
    val coll = prep(rows, config).cache()
    val m = RaBitQ.train(coll, RaBitQ.Config(dims = 8))
    // zero row: sabs = 0 -> e guarded to 0; full candidates still exact
    val q = detVec(50, 8)
    val exact = Search.flatSearch(coll, config, q, 21).collect().map(_.getString(0))
    val rq = RaBitQ.search(RaBitQ.withCodes(coll, m), config, m, q, 21,
      candidates = 21).collect().map(_.getString(0))
    assert(rq.toSeq === exact.toSeq)
    // zero query: qhat all-zero, every estimate = prior; search still
    // returns limit rows after the exact rerank
    val z = RaBitQ.search(RaBitQ.withCodes(coll, m), config, m,
      Array.fill(8)(0.0f), 5, candidates = 21)
    assert(z.count() === 5)
    coll.unpersist()
  }
}
