package graft

import org.apache.spark.sql.functions._

import graft.ann.{IvfIndex, IvfRaBitQ, ModelStore, RaBitQ}
import graft.core.{CollectionConfig, Metric}
import graft.prepare.Prepare
import graft.search.Search

/** IVF x RaBitQ: per-cell residual encode contracts (shifted factors),
  * equivalence to exact flat at full probe + full candidates for every
  * metric, batch == single, the at-rest layout's directory pruning, and
  * the sidecar/append/compact lifecycle. */
class IvfRaBitQSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  private def prep(rows: Seq[(String, Array[Float])], config: CollectionConfig) =
    Prepare.prepareEmbeddings(embeddingRows(rows), config)

  private def detVec(i: Int, d: Int): Array[Float] =
    Array.tabulate(d)(j => math.sin(i * 1.9 + j * 0.47).toFloat +
      (if (j % 4 == 0) 0.3f * (i % 7) else 0.0f))

  private def trainModel(df: org.apache.spark.sql.DataFrame,
      config: CollectionConfig, k: Int = 4): IvfRaBitQ.Model = {
    val cents = IvfIndex.trainOrdered(df, config,
      IvfIndex.IvfConfig(k = k, iterations = 3), col("id"))
    IvfRaBitQ.Model(cents, RaBitQ.Config(dims = config.dimensions,
      centered = true))
  }

  test("encode: cell is the nearest centroid; factors are the per-cell " +
      "residual's, oc is shifted by -||c||^2/2") {
    val d = 16
    val config = CollectionConfig("irq", d, Metric.L2)
    val coll = prep((0 until 48).map(i => (f"id-$i%02d", detVec(i, d))), config).cache()
    val m = trainModel(coll, config)
    val enc = IvfRaBitQ.prepare(coll, m)
      .select("id", "vector", "ivf_cell", IvfRaBitQ.StructCol).collect()
    assert(enc.nonEmpty)
    enc.take(12).foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val cell = r.getInt(2)
      assert(cell === IvfIndex.nearestCentroid(v, m.centroids), r.getString(0))
      val cm = m.cellModels(cell)
      val (codes, rnorm, sabs, ocRaw) = RaBitQ.encodeVec(v, cm)
      val s = r.getStruct(3)
      assert(s.getSeq[Long](0) === codes.toSeq)
      assert(math.abs(s.getDouble(1) - rnorm) < 1e-12)
      assert(math.abs(s.getDouble(2) - sabs) < 1e-12)
      assert(math.abs(s.getDouble(3) - (ocRaw - cm.cc / 2.0)) < 1e-9)
    }
    coll.unpersist()
  }

  test("shifted-factor algebra: the cc=0 estimator reassembles full-space " +
      "ip and cosine from per-cell residual codes") {
    val d = 32
    val config = CollectionConfig("irq", d, Metric.InnerProduct)
    val rows = (0 until 60).map(i => (f"id-$i%02d", detVec(i, d)))
    val coll = prep(rows, config).cache()
    val m = trainModel(coll, config)
    val q = detVec(83, d)
    var ipErr = 0.0; var ipPrior = 0.0
    var cosErr = 0.0; var cosPrior = 0.0
    rows.foreach { case (_, v) =>
      val cell = graft.ann.IvfIndex.nearestCentroid(v, m.centroids)
      val cm = m.cellModels(cell)
      val (codes, rnorm, sabs, ocRaw) = RaBitQ.encodeVec(v, cm)
      val oc = ocRaw - cm.cc / 2.0
      val qp = IvfRaBitQ.prepareQueryCell(m, q, cell)
      // mode 1 rank = -est<q,o>; mode 3 rank = -est cosine — cc = 0
      val estIp = -RaBitQ.rankBits(codes, rnorm, sabs, oc,
        qp.qhat, qp.nqr, qp.qc, 0.0, 1)
      val estCos = -RaBitQ.rankBits(codes, rnorm, sabs, oc,
        qp.qhat, qp.nqr, qp.qc, 0.0, 3)
      val trueIp = v.zip(q).map { case (a, b) => a.toDouble * b }.sum
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      // mode 3 estimates <q,o>/||o|| (the query is unit-normalized by
      // prepareQuery under a real cosine config; here q is raw, so
      // compare against the same un-normalized-query quantity)
      val trueCosQ = trueIp / nv
      ipErr += math.abs(estIp - trueIp)
      cosErr += math.abs(estCos - trueCosQ)
      // prior = what the factors alone say with zero bit information
      // (e = 0): the cross-terms only — the bits must beat it clearly
      ipPrior += math.abs((qp.qc + oc) - trueIp)
      val on2 = rnorm * rnorm + 2.0 * oc
      cosPrior += math.abs(
        (if (on2 <= 0.0) 0.0 else (qp.qc + oc) / math.sqrt(on2)) - trueCosQ)
    }
    assert(ipErr < 0.5 * ipPrior, s"ip estimator uninformative: $ipErr vs $ipPrior")
    assert(cosErr < 0.5 * cosPrior, s"cos estimator uninformative: $cosErr vs $cosPrior")
    // the reassembled ||o||^2 must be near-exact (it uses factors only,
    // no bit estimate): rnorm^2 + 2 oc' == ||o||^2 up to fp noise
    rows.take(8).foreach { case (_, v) =>
      val cell = graft.ann.IvfIndex.nearestCentroid(v, m.centroids)
      val cm = m.cellModels(cell)
      val (_, rnorm, _, ocRaw) = RaBitQ.encodeVec(v, cm)
      val on2 = rnorm * rnorm + 2.0 * (ocRaw - cm.cc / 2.0)
      val truth = v.map(x => x.toDouble * x).sum
      assert(math.abs(on2 - truth) < 1e-6, s"$on2 vs $truth")
    }
    coll.unpersist()
  }

  test("equivalence: nprobe = cells + candidates = n degenerates to exact " +
      "flat for l2/cosine/ip/nip (the shifted factors reassemble full-space values)") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.InnerProduct,
        Metric.NegativeInnerProduct)) {
      val d = 24
      val config = CollectionConfig("irq", d, metric)
      val coll = prep((0 until 64).map(i => (f"id-$i%02d", detVec(i, d))), config).cache()
      val m = trainModel(coll, config)
      val q = detVec(91, d)
      val exact = Search.flatSearch(coll, config, q, 10).collect()
        .map(r => (r.getString(0), r.getDouble(2)))
      val got = IvfRaBitQ.search(coll, config, m, q, 10,
        nprobe = m.cells, candidates = 64).collect()
        .map(r => (r.getString(0), r.getDouble(2)))
      assert(got.toSeq === exact.toSeq, s"metric ${metric.name}")
      coll.unpersist()
    }
  }

  test("partial probe on real embeddings: recall floor holds and the " +
      "residual estimator ranks candidates sanely") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val m = trainModel(coll, config, k = 8)
    val prepared = IvfRaBitQ.prepare(coll, m).cache()
    prepared.count()
    val hits = (0L until 5L).map { qi =>
      val q = Tables.queryVector(spark, sfDir, qi)
      val exact = Search.flatSearch(coll, config, q, 10).collect()
        .map(_.getString(0)).toSet
      val got = IvfRaBitQ.search(prepared, config, m, q, 10,
        nprobe = 8, candidates = 40).collect().map(_.getString(0)).toSet
      (exact & got).size
    }.sum
    assert(hits >= 40, s"full-probe recall too low: $hits/50")
    prepared.unpersist(); coll.unpersist()
  }

  test("batch == single per query; empty query frame -> empty typed result") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val m = trainModel(coll, config, k = 8)
    val prepared = IvfRaBitQ.prepare(coll, m).cache()
    prepared.count()
    val qs = Tables.read(spark, sfDir, "embeddings").filter(col("vec_id") < 4)
      .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
    val batch = IvfRaBitQ.searchMany(prepared, config, m, qs, 5, nprobe = 2,
      candidates = 30, knownNq = 4L).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r =>
        (r.getString(1), r.getDouble(3))).sortBy(r => (-r._2, r._1))).toMap
    for (qi <- 0L until 4L) {
      val q = Tables.queryVector(spark, sfDir, qi)
      val single = IvfRaBitQ.search(prepared, config, m, q, 5, nprobe = 2,
        candidates = 30).collect().map(r => (r.getString(0), r.getDouble(2)))
      assert(batch(qi.toString).toSeq === single.toSeq, s"query $qi")
    }
    val empty = IvfRaBitQ.searchMany(prepared, config, m, qs.limit(0), 5,
      nprobe = 2, candidates = 30, knownNq = 0L)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq ===
      Seq("qid", "id", "value", "score", "distance", "metric"))
    prepared.unpersist(); coll.unpersist()
  }

  test("at-rest layout: partitioned search == in-memory, the probe is a " +
      "PartitionFilter, and append/compact through the sidecar keep results") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.l2Config(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config)
      .filter(col("id").cast("long") >= 8).cache()
    val m = trainModel(coll, config, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfrabitq").toString
    IvfRaBitQ.writePartitioned(coll.drop("metadata"), m, dir)

    // sidecar round trip is bit-identical
    val loaded = IvfRaBitQ.loadModel(spark, dir)
    assert(loaded.config === m.config)
    assert(loaded.centroids.map(_.toSeq).toSeq === m.centroids.map(_.toSeq).toSeq)

    val q = Tables.queryVector(spark, sfDir, 3L)
    val mem = IvfRaBitQ.search(coll, config, m, q, 10, nprobe = 2,
      candidates = 40).collect().map(r => (r.getString(0), r.getDouble(3)))
    val rest = IvfRaBitQ.searchPartitioned(spark, dir, config, q, 10,
      nprobe = 2, candidates = 40).collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(rest.toSeq === mem.toSeq)

    // the probe set reaches the scan as a PartitionFilter
    val plan = IvfRaBitQ.searchPartitioned(spark, dir, config, q, 10,
      nprobe = 2, candidates = 40).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ivf_cell".r.findFirstIn(plan).isDefined,
      s"probe did not prune directories:\n$plan")

    // append NEW rows through the persisted model — results include them
    val extra = Tables.embeddingsCollection(spark, sfDir, config)
      .filter(col("id").cast("long") < 8).drop("metadata")
    IvfRaBitQ.appendPartitioned(spark, dir, extra)
    val all = spark.read.parquet(dir)
    assert(all.count() === Tables.embeddingsCollection(spark, sfDir, config).count())
    val full = Tables.embeddingsCollection(spark, sfDir, config)
    val memAll = IvfRaBitQ.search(full, config, m, q, 10, nprobe = 8,
      candidates = 40).collect().map(_.getString(0))
    val restAll = IvfRaBitQ.searchPartitioned(spark, dir, config, q, 10,
      nprobe = 8, candidates = 40).collect().map(_.getString(0))
    assert(restAll.toSeq === memAll.toSeq)

    // duplicate-id append is rejected
    intercept[IllegalArgumentException] {
      IvfRaBitQ.appendPartitioned(spark, dir, extra)
    }

    // compaction keeps results and the sidecar
    val before = IvfRaBitQ.searchManyPartitioned(spark, dir, config,
      Tables.read(spark, sfDir, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector")), 5, nprobe = 2, candidates = 30,
      knownNq = 3L).collect().map(r => (r.getString(0), r.getString(1))).sorted
    graft.store.Compaction.compact(spark, dir, 128L * 1024 * 1024)
    assert(IvfRaBitQ.hasModel(spark, dir))
    val after = IvfRaBitQ.searchManyPartitioned(spark, dir, config,
      Tables.read(spark, sfDir, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector")), 5, nprobe = 2, candidates = 30,
      knownNq = 3L).collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(after.toSeq === before.toSeq)
    coll.unpersist()
  }
}
