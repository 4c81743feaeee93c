package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.{Pq, Sq8}
import graft.core.{CollectionConfig, Metric}
import graft.prepare.Prepare
import graft.search.Search

/** SQ8 scalar quantization + PQ product quantization: encode contracts,
  * full-candidates equivalence to exact flat search, and recall sanity
  * on real embeddings. */
class QuantizationSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  private def prep(rows: Seq[(String, Array[Float])], config: CollectionConfig) =
    Prepare.prepareEmbeddings(embeddingRows(rows), config)

  private def gridColl(config: CollectionConfig) = prep(
    (0 until 64).map { i =>
      f"id-$i%02d" -> Array(i / 10.0f, (i * 7 % 17) / 5.0f, (i * 11 % 19) / 7.0f, (i % 3) / 1.0f)
    }, config)

  test("sq8 encode: codes in range, constant dims -> 0, extremes hit 0/255") {
    val vecs = Seq(
      Array(0.0f, 5.0f, -1.0f),
      Array(1.0f, 5.0f, 3.0f),
      Array(0.5f, 5.0f, 1.0f))
    val model = Sq8.train(embeddingRows(vecs.zipWithIndex.map { case (v, i) => (s"r$i", v) }))
    assert(model.mn.toSeq === Seq(0.0f, 5.0f, -1.0f))
    assert(model.rng.toSeq === Seq(1.0f, 0.0f, 4.0f))
    val c0 = Sq8.encodeVec(vecs(0), model)
    val c1 = Sq8.encodeVec(vecs(1), model)
    assert((c0(0) & 0xff) === 0 && (c1(0) & 0xff) === 255)
    assert((c0(1) & 0xff) === 0 && (c1(1) & 0xff) === 0) // constant dim
    assert((c0(2) & 0xff) === 0 && (c1(2) & 0xff) === 255)
    // midpoint rounds half-up: (0.5-0)*255/1 = 127.5 -> 128
    assert((Sq8.encodeVec(vecs(2), model)(0) & 0xff) === 128)
  }

  test("sq8 equivalence: candidates = n degenerates to exact flat (l2 + cosine)") {
    for (metric <- Seq(Metric.L2, Metric.Cosine)) {
      val config = CollectionConfig("grid", 4, metric)
      val coll = gridColl(config).cache()
      val model = Sq8.train(coll)
      val q = Array(2.25f, 1.5f, 0.75f, 1.0f)
      val exact = Search.flatSearch(coll, config, q, 10).collect().map(r => (r.getString(0), r.getDouble(2)))
      val sq8 = Sq8.search(coll, config, model, q, 10, candidates = 64)
        .collect().map(r => (r.getString(0), r.getDouble(2)))
      assert(sq8.toSeq === exact.toSeq, s"metric ${metric.name}")
      coll.unpersist()
    }
  }

  test("sq8 recall on real embeddings: small candidate cut finds most of exact top-10") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val model = Sq8.train(coll)
    val withCodes = Sq8.withCodes(coll, model).cache()
    val hits = (1L to 5L).map { qi =>
      val q = Tables.queryVector(spark, sfDir, qi)
      val exact = Search.flatSearch(coll, config, q, 10).collect().map(_.getString(0)).toSet
      val approx = Sq8.search(withCodes, config, model, q, 10, candidates = 30)
        .collect().map(_.getString(0)).toSet
      (exact & approx).size
    }
    val mean = hits.sum / 50.0
    // 8-bit codes are near-lossless: tight cut should preserve nearly all
    assert(mean >= 0.9, s"mean sq8 recall@10 $mean")
    withCodes.unpersist(); coll.unpersist()
  }

  test("pq: codes are m bytes, training deterministic, equivalence at full candidates") {
    val config = CollectionConfig("grid", 4, Metric.L2)
    val coll = gridColl(config).cache()
    val pq = Pq.PqConfig(m = 2, k = 4, iterations = 3, sampleSize = 64)
    val cb1 = Pq.trainOrdered(coll, config, pq, col("id"))
    val cb2 = Pq.trainOrdered(coll, config, pq, col("id"))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(cb1.length === 2 && cb1(0).length === 4 && cb1(0)(0).length === 2)
    val codes = Pq.encodeVec(Array(1f, 2f, 3f, 4f), cb1)
    assert(codes.length === 2)
    val q = Array(2.25f, 1.5f, 0.75f, 1.0f)
    val exact = Search.flatSearch(coll, config, q, 10).collect().map(r => (r.getString(0), r.getDouble(2)))
    val viaPq = Pq.search(coll, config, cb1, q, 10, candidates = 64)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(viaPq.toSeq === exact.toSeq)
    coll.unpersist()
  }

  test("pq recall on real embeddings beats random-candidate baseline") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val pq = Pq.PqConfig(m = 8, k = 16, iterations = 3, sampleSize = 256)
    val cb = Pq.trainOrdered(coll, config, pq, col("id").cast("long"))
    val withCodes = Pq.withCodes(coll, cb).cache()
    val n = coll.count().toInt
    val hits = (1L to 5L).map { qi =>
      val q = Tables.queryVector(spark, sfDir, qi)
      val exact = Search.flatSearch(coll, config, q, 10).collect().map(_.getString(0)).toSet
      val approx = Pq.search(withCodes, config, cb, q, 10, candidates = n / 10)
        .collect().map(_.getString(0)).toSet
      (exact & approx).size
    }
    val mean = hits.sum / 50.0
    // 10% candidate budget must recover well over the 10% a random cut would
    assert(mean >= 0.5, s"mean pq recall@10 $mean")
    withCodes.unpersist(); coll.unpersist()
  }

  test("ivf-pq: full probe + full candidates degenerates to exact flat; partial probe stays sane") {
    val config = CollectionConfig("grid", 4, Metric.L2)
    val coll = gridColl(config).cache()
    val ivf = graft.ann.IvfIndex.IvfConfig(k = 4, iterations = 3)
    val cents = graft.ann.IvfIndex.trainOrdered(coll, config, ivf, col("id"))
    val cb = Pq.trainOrdered(coll, config, Pq.PqConfig(m = 2, k = 4, iterations = 3, sampleSize = 64), col("id"))
    val prepared = graft.ann.IvfPq.prepare(coll, cents, cb).cache()
    val q = Array(2.25f, 1.5f, 0.75f, 1.0f)
    val exact = Search.flatSearch(coll, config, q, 10).collect().map(r => (r.getString(0), r.getDouble(2)))
    val full = graft.ann.IvfPq.search(prepared, config, cents, cb, q, 10,
      nprobe = 4, candidates = 64).collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(full.toSeq === exact.toSeq)
    // partial probe returns k rows from the probed cells, exact-reranked
    val partial = graft.ann.IvfPq.search(prepared, config, cents, cb, q, 5,
      nprobe = 2, candidates = 16).collect()
    assert(partial.length === 5)
    assert(partial.map(_.getDouble(3)).toSeq === partial.map(_.getDouble(3)).sorted.toSeq)
    prepared.unpersist(); coll.unpersist()
  }

  test("residual ivf-pq: ≡ flat at full probe+candidates; beats raw-vector PQ quantization error") {
    val sfd = sfDir
    val d = Tables.dims(spark, sfd)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfd, config).cache()
    val order = col("id").cast("long")
    val cents = graft.ann.IvfIndex.trainOrdered(coll, config,
      graft.ann.IvfIndex.IvfConfig(k = 8, iterations = 3), order)
    val pqCfg = Pq.PqConfig(m = 8, k = 16, iterations = 3, sampleSize = 256)
    val resCb = graft.ann.IvfPq.trainResidual(coll, config, cents, pqCfg, order)
    val n = coll.count().toInt
    val q = Tables.queryVector(spark, sfd, 1L)
    val exact = Search.flatSearch(coll, config, q, 10).collect().map(r => (r.getString(0), r.getDouble(2)))
    val full = graft.ann.IvfPq.searchResidual(coll, config, cents, resCb, q, 10,
      nprobe = 8, candidates = n).collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(full.toSeq === exact.toSeq)
    // residual codebooks should reconstruct better than raw-vector ones:
    // compare mean ADC self-distance (quantization error proxy)
    val rawCb = Pq.trainOrdered(coll, config, pqCfg, order)
    val sample = coll.orderBy(order).select("vector").limit(100)
      .collect().map(_.getSeq[Float](0).toArray)
    def err(cb: Array[Array[Array[Float]]], residual: Boolean): Double = sample.map { v =>
      val enc = if (residual) {
        val c = graft.ann.IvfIndex.nearestCentroid(v, cents)
        val r = graft.ann.IvfPq.residualVec(v, cents(c))
        val codes = Pq.encodeVec(r, cb)
        graft.expr.VectorKernels.adcLookup(codes, Pq.adcTable(cb, r, graft.core.Metric.L2Squared), pqCfg.k)
      } else {
        val codes = Pq.encodeVec(v, cb)
        graft.expr.VectorKernels.adcLookup(codes, Pq.adcTable(cb, v, graft.core.Metric.L2Squared), pqCfg.k)
      }
      enc
    }.sum / sample.length
    assert(err(resCb, residual = true) < err(rawCb, residual = false),
      "residual quantization error should be below raw-vector error")
    coll.unpersist()
  }

  test("sq8/pq/ivf-pq batch searchMany equals per-query search") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val order = col("id").cast("long")
    val sq8Model = Sq8.train(coll)
    val sq8Coded = Sq8.withCodes(coll, sq8Model).cache()
    val pqCfg = Pq.PqConfig(m = 8, k = 16, iterations = 3, sampleSize = 256)
    val cb = Pq.trainOrdered(coll, config, pqCfg, order)
    val pqCoded = Pq.withCodes(coll, cb).cache()
    val cents = graft.ann.IvfIndex.trainOrdered(coll, config,
      graft.ann.IvfIndex.IvfConfig(k = 8, iterations = 3), order)
    val prepared = graft.ann.IvfPq.prepare(coll, cents, cb).cache()
    val qids = 0L until 4L
    val queries = spark.createDataFrame(
      java.util.Arrays.asList(qids.map(i => org.apache.spark.sql.Row(
        i.toString, Tables.queryVector(spark, sfDir, i).toSeq)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("qvector",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val families = Seq[(String, DataFrame => DataFrame, (Array[Float], Int) => DataFrame)](
      ("sq8", qs => Sq8.searchMany(sq8Coded, config, sq8Model, qs, 5),
        (q, k) => Sq8.search(sq8Coded, config, sq8Model, q, k)),
      ("pq", qs => Pq.searchMany(pqCoded, config, cb, qs, 5),
        (q, k) => Pq.search(pqCoded, config, cb, q, k)),
      ("ivfpq", qs => graft.ann.IvfPq.searchMany(prepared, config, cents, cb, qs, 5, nprobe = 3),
        (q, k) => graft.ann.IvfPq.search(prepared, config, cents, cb, q, k, nprobe = 3)))
    for ((fam, many, single) <- families) {
      val batch = many(queries).collect().groupBy(_.getString(0))
      qids.foreach { i =>
        val s = single(Tables.queryVector(spark, sfDir, i), 5).collect()
        val got = batch(i.toString).sortBy(r => (r.getDouble(4), r.getString(1)))
        assert(got.map(_.getString(1)).toSeq === s.map(_.getString(0)).toSeq,
          s"$fam qid $i ids")
        assert(got.map(_.getDouble(3)).toSeq === s.map(_.getDouble(2)).toSeq,
          s"$fam qid $i scores")
      }
    }
    // shuffle fallback (broadcastMaxRows = 1) returns the same rows
    spark.conf.set("spark.graft.rerank.broadcastMaxRows", "1")
    try {
      val viaShuffle = Sq8.searchMany(sq8Coded, config, sq8Model, queries, 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).sorted
      spark.conf.unset("spark.graft.rerank.broadcastMaxRows")
      val viaBroadcast = Sq8.searchMany(sq8Coded, config, sq8Model, queries, 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).sorted
      assert(viaShuffle.toSeq === viaBroadcast.toSeq)
    } finally spark.conf.unset("spark.graft.rerank.broadcastMaxRows")
    prepared.unpersist(); pqCoded.unpersist(); sq8Coded.unpersist(); coll.unpersist()
  }

  test("opq rotation: deterministic signs, orthonormal, fht path agrees") {
    val d = 64
    val s1 = graft.ann.Opq.signs(d, 7L)
    val s2 = graft.ann.Opq.signs(d, 7L)
    assert(s1.toSeq === s2.toSeq)
    assert(s1.forall(s => s == 1.0f || s == -1.0f))
    assert(graft.ann.Opq.signs(d, 8L).toSeq !== s1.toSeq)
    val v = Array.tabulate(d)(i => math.sin(i * 0.37).toFloat)
    val w = Array.tabulate(d)(i => math.cos(i * 0.53).toFloat)
    val (rv, rw) = (graft.ann.Opq.rotate(v, s1), graft.ann.Opq.rotate(w, s1))
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    // orthonormal: norms and pairwise dots are preserved
    assert(math.abs(dot(rv, rv) - dot(v, v)) < 1e-4)
    assert(math.abs(dot(rv, rw) - dot(v, w)) < 1e-4)
    // the O(d log d) butterfly computes the same rotation
    val fht = graft.ann.Opq.rotateFht(v, s1)
    assert(rv.zip(fht).forall { case (a, b) => math.abs(a - b) < 1e-5 })
    intercept[IllegalArgumentException] { graft.ann.Opq.rotate(Array(1f, 2f, 3f), s1.take(3)) }
  }

  test("opq-rotated pq: full candidates degenerates to exact flat in rotated space") {
    val config = CollectionConfig("grid", 4, Metric.Cosine)
    val coll = gridColl(config).cache()
    val sgn = graft.ann.Opq.signs(4, 7L)
    val rot = graft.ann.Opq.withRotated(coll, sgn).cache()
    val rcfg = config.copy(normalize = Some(graft.core.Normalize.None))
    val cb = Pq.trainOrdered(rot, rcfg, Pq.PqConfig(m = 2, k = 4, iterations = 3, sampleSize = 64), col("id"))
    val q0 = Search.prepareQuery(config, Array(2.25f, 1.5f, 0.75f, 1.0f))
    val rq = graft.ann.Opq.rotate(q0, sgn)
    val exact = Search.flatSearch(rot, rcfg, rq, 10).collect().map(r => (r.getString(0), r.getDouble(2)))
    val viaPq = Pq.search(rot, rcfg, cb, rq, 10, candidates = 64)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(viaPq.toSeq === exact.toSeq)
    // rotation preserves the cosine ranking of the unrotated collection
    val unrot = Search.flatSearch(coll, config, q0, 3).collect().map(_.getString(0))
    assert(exact.take(3).map(_._1).toSeq === unrot.toSeq)
    rot.unpersist(); coll.unpersist()
  }

  test("residual ivf-pq batch searchMany equals per-query searchResidual") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val order = col("id").cast("long")
    val cents = graft.ann.IvfIndex.trainOrdered(coll, config,
      graft.ann.IvfIndex.IvfConfig(k = 8, iterations = 3), order)
    val resCb = graft.ann.IvfPq.trainResidual(coll, config, cents,
      Pq.PqConfig(m = 8, k = 16, iterations = 3, sampleSize = 256), order)
    val prepared = graft.ann.IvfPq.withResidualCodes(coll, cents, resCb).cache()
    val qids = 0L until 4L
    val queries = spark.createDataFrame(
      java.util.Arrays.asList(qids.map(i => org.apache.spark.sql.Row(
        i.toString, Tables.queryVector(spark, sfDir, i).toSeq)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("qvector",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val batch = graft.ann.IvfPq.searchManyResidual(prepared, config, cents, resCb,
      queries, 5, nprobe = 3).collect().groupBy(_.getString(0))
    qids.foreach { i =>
      val s = graft.ann.IvfPq.searchResidual(prepared, config, cents, resCb,
        Tables.queryVector(spark, sfDir, i), 5, nprobe = 3).collect()
      val got = batch(i.toString).sortBy(r => (r.getDouble(4), r.getString(1)))
      assert(got.map(_.getString(1)).toSeq === s.map(_.getString(0)).toSeq, s"qid $i ids")
      assert(got.map(_.getDouble(3)).toSeq === s.map(_.getDouble(2)).toSeq, s"qid $i scores")
    }
    prepared.unpersist(); coll.unpersist()
  }

  test("model sidecars round-trip bit-identically; load-then-search == train-then-search") {
    import graft.ann.{IvfIndex, IvfPq, ModelStore, Opq}
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val q = Tables.queryVector(spark, sfDir, 3L)
    val tmp = "/tmp/graft_modelstore_spec"

    // SQ8: exact float round-trip through the JSON sidecar
    val sq8 = Sq8.train(coll)
    ModelStore.saveSq8(spark, s"$tmp/sq8.json", sq8)
    val sq8L = ModelStore.loadSq8(spark, s"$tmp/sq8.json")
    assert(sq8L.mn.toSeq === sq8.mn.toSeq && sq8L.rng.toSeq === sq8.rng.toSeq)
    assert(Sq8.search(coll, config, sq8L, q, 10, candidates = 30).collect().toSeq ===
      Sq8.search(coll, config, sq8, q, 10, candidates = 30).collect().toSeq)

    // PQ codebooks
    val pqCfg = Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 128)
    val cb = Pq.trainOrdered(coll, config, pqCfg, col("id").cast("long"))
    ModelStore.savePq(spark, s"$tmp/pq.json", cb)
    val cbL = ModelStore.loadPq(spark, s"$tmp/pq.json")
    assert(cbL.map(_.map(_.toSeq).toSeq).toSeq === cb.map(_.map(_.toSeq).toSeq).toSeq)

    // OPQ seed + codebooks
    ModelStore.saveOpq(spark, s"$tmp/opq.json", 7L, cb)
    val (seedL, ocbL) = ModelStore.loadOpq(spark, s"$tmp/opq.json")
    assert(seedL === 7L)
    assert(Opq.signs(d, seedL).toSeq === Opq.signs(d, 7L).toSeq)
    assert(ocbL.map(_.map(_.toSeq).toSeq).toSeq === cb.map(_.map(_.toSeq).toSeq).toSeq)

    // IVF-PQ partitioned layout: the sidecar rides the written directory
    val cents = IvfIndex.trainOrdered(coll, config,
      IvfIndex.IvfConfig(k = 4, iterations = 3), col("id").cast("long"))
    IvfPq.writePartitioned(coll.drop("metadata"), cents, cb, s"$tmp/ivfpq")
    assert(IvfPq.hasModel(spark, s"$tmp/ivfpq"))
    val (centsL, cbL2, residual) = IvfPq.loadModel(spark, s"$tmp/ivfpq")
    assert(!residual)
    assert(centsL.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
    assert(cbL2.map(_.map(_.toSeq).toSeq).toSeq === cb.map(_.map(_.toSeq).toSeq).toSeq)
    // a cold session: loaded model + at-rest codes == trained in-memory
    assert(
      IvfPq.searchPartitioned(spark, s"$tmp/ivfpq", config, centsL, cbL2,
        q, 10, nprobe = 4, candidates = 50).collect().toSeq ===
      IvfPq.search(coll.drop("metadata"), config, cents, cb, q, 10,
        nprobe = 4, candidates = 50).collect().toSeq)

    // residual layout sidecar carries the residual flag
    val rcb = IvfPq.trainResidual(coll, config, cents, pqCfg, col("id").cast("long"))
    IvfPq.writePartitionedResidual(coll.drop("metadata"), cents, rcb, s"$tmp/ivfpq_res")
    val (_, rcbL, res2) = IvfPq.loadModel(spark, s"$tmp/ivfpq_res")
    assert(res2)
    assert(rcbL.map(_.map(_.toSeq).toSeq).toSeq === rcb.map(_.map(_.toSeq).toSeq).toSeq)

    // IVF centroid sidecar on the cell-partitioned layout
    IvfIndex.writePartitioned(coll.drop("metadata"), cents, s"$tmp/ivf")
    assert(IvfIndex.loadModel(spark, s"$tmp/ivf").map(_.toSeq).toSeq ===
      cents.map(_.toSeq).toSeq)

    // kind mismatch is rejected, not silently mis-parsed
    intercept[IllegalArgumentException] { ModelStore.loadPq(spark, s"$tmp/sq8.json") }
    coll.unpersist()
  }

  test("model sidecars: non-finite values refused at SAVE, truncated JSON diagnosed at LOAD") {
    import graft.ann.ModelStore
    val tmp = "/tmp/graft_modelstore_guards"
    // a poisoned model (NaN from 0/0, Infinity from overflow) must fail
    // at persist time with a clear message, not at some later cold open
    val bad = Sq8.Model(mn = Array(0f, Float.NaN), rng = Array(1f, 1f))
    val e = intercept[IllegalArgumentException] {
      ModelStore.saveSq8(spark, s"$tmp/bad.json", bad)
    }
    assert(e.getMessage.contains("non-finite"))
    // a truncated sidecar (partial write, disk full) surfaces the
    // parser's positioned diagnostic, not a raw index-out-of-bounds
    val good = Sq8.Model(mn = Array(0f, 1f), rng = Array(1f, 2f))
    ModelStore.saveSq8(spark, s"$tmp/good.json", good)
    val full = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/good.json")), "UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/trunc.json"),
      full.substring(0, full.length / 2).getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      ModelStore.loadSq8(spark, s"$tmp/trunc.json")
    }
    assert(e2.getMessage.contains("bad model JSON"))
    // overwrite re-save replaces the sidecar in place (atomic rename)
    ModelStore.saveSq8(spark, s"$tmp/good.json", bad2Good(good))
    assert(ModelStore.loadSq8(spark, s"$tmp/good.json").mn.toSeq === bad2Good(good).mn.toSeq)
    // the writer only emits \" and \\ — a hand-edited sidecar with any
    // other escape (\n, \t, \uXXXX) must FAIL, not silently parse to
    // wrong string content
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/esc.json"),
      """{"kind":"hnsw","shards":2,"m":16,"m0":32,"ef_construction":200,"ef_search":50,"max_level":16,"version":"a\nb"}""".getBytes("UTF-8"))
    val e3 = intercept[IllegalArgumentException] {
      ModelStore.loadHnsw(spark, s"$tmp/esc.json")
    }
    assert(e3.getMessage.contains("unsupported escape"))
    // ...while the two escapes the writer emits still round-trip
    ModelStore.saveHnsw(spark, s"$tmp/escok.json", 2,
      graft.index.Hnsw.Params(), version = """v"q\z""")
    assert(ModelStore.loadHnsw(spark, s"$tmp/escok.json")._3 === """v"q\z""")
  }

  private def bad2Good(m: Sq8.Model): Sq8.Model =
    Sq8.Model(mn = m.mn.map(_ + 1f), rng = m.rng)

  test("sq8/pq reject dimension mismatches and bad configs") {
    val model = Sq8.Model(Array(0f, 0f), Array(1f, 1f))
    intercept[IllegalArgumentException] { Sq8.encodeVec(Array(1f), model) }
    val config = CollectionConfig("x", 3, Metric.L2)
    val coll = prep(Seq("a" -> Array(1f, 2f, 3f)), config)
    intercept[IllegalArgumentException] {
      Pq.trainOrdered(coll, config, Pq.PqConfig(m = 2), col("id"))
    }
  }
}
