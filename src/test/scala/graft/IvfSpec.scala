package graft

import graft.ann.IvfIndex
import graft.core.{CollectionConfig, Metric}
import graft.search.Search

/** IVF coarse-quantizer ANN behavior. */
class IvfSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  test("IVF with nprobe == k equals exact flat search") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val centroids = IvfIndex.train(coll, config, IvfIndex.IvfConfig(k = 8, iterations = 5))
    val q = Tables.queryVector(spark, sfDir, 2L)
    val exact = Search.flatSearch(coll, config, q, 10).collect().map(_.getString(0)).toSeq
    val full = IvfIndex.search(coll, config, centroids, q, 10, nprobe = 8)
      .collect().map(_.getString(0)).toSeq
    assert(full === exact)
    coll.unpersist()
  }

  test("IVF training is deterministic; partial probe keeps useful recall") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val ivf = IvfIndex.IvfConfig(k = 8, iterations = 5)
    val c1 = IvfIndex.train(coll, config, ivf)
    val c2 = IvfIndex.train(coll, config, ivf)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val overlaps = (0L until 5L).map(i =>
      IvfIndex.overlapAtK(coll, config, c1, Tables.queryVector(spark, sfDir, i), 10, nprobe = 4))
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.5, s"mean overlap $mean: $overlaps")
    coll.unpersist()
  }

  test("adaptive probing: huge ratio degenerates to exact flat; probe set is a ratio-bounded prefix") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val centroids = IvfIndex.train(coll, config, IvfIndex.IvfConfig(k = 8, iterations = 5))
    val raw = Tables.queryVector(spark, sfDir, 2L)
    val q = Search.prepareQuery(config, raw)
    // ratio wide enough to admit every cell + maxProbe = k => exact flat
    val exact = Search.flatSearch(coll, config, raw, 10).collect().map(_.getString(0)).toSeq
    val all = IvfIndex.searchAdaptive(coll, config, centroids, raw, 10,
      ratio = 1e9, maxProbe = 8).collect().map(_.getString(0)).toSeq
    assert(all === exact)
    // the adaptive probe set is always a prefix of the distance-sorted
    // cells (never skips a nearer cell), bounded by maxProbe
    val adaptive = IvfIndex.probeCellsAdaptive(q, centroids, ratio = 1.2, maxProbe = 4)
    val sorted = IvfIndex.probeCells(q, centroids, nprobe = 8)
    assert(adaptive === sorted.take(adaptive.size))
    assert(adaptive.nonEmpty && adaptive.size <= 4)
    // tight ratio probes strictly fewer cells than a loose one
    val loose = IvfIndex.probeCellsAdaptive(q, centroids, ratio = 1e9, maxProbe = 8)
    assert(loose.size === 8)
    assert(adaptive.size <= loose.size)
    coll.unpersist()
  }

  test("batch IVF search equals per-query IVF search") {
    import org.apache.spark.sql.functions._
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val centroids = IvfIndex.train(coll, config, IvfIndex.IvfConfig(k = 8, iterations = 5))
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
    val batch = IvfIndex.searchMany(coll, config, centroids, queries, 5, nprobe = 3)
      .collect().groupBy(_.getString(0))
    qids.foreach { i =>
      val single = IvfIndex.search(coll, config, centroids,
        Tables.queryVector(spark, sfDir, i), 5, nprobe = 3).collect()
      // batch rows carry no rank column; (distance asc, id asc) is the
      // same total order the window used
      val got = batch(i.toString).sortBy(r => (r.getDouble(4), r.getString(1)))
      assert(got.map(_.getString(1)).toSeq ===
        single.map(_.getString(0)).toSeq, s"qid $i")
      assert(got.map(_.getDouble(3)).toSeq ===
        single.map(_.getDouble(2)).toSeq, s"qid $i")
    }
    coll.unpersist()
  }

  test("adaptive batch == per-query adaptive; probe-union pruning changes nothing") {
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val centroids = IvfIndex.train(coll, config, IvfIndex.IvfConfig(k = 8, iterations = 5))
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
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val batch = keyed(IvfIndex.searchManyAdaptive(coll, config, centroids,
      queries, 5, ratio = 1.2, maxProbe = 4).collect())
    qids.foreach { i =>
      val single = IvfIndex.searchAdaptive(coll, config, centroids,
        Tables.queryVector(spark, sfDir, i), 5, ratio = 1.2, maxProbe = 4)
        .collect().map(r => (i.toString, r.getString(0))).sorted.toSeq
      assert(batch.filter(_._1 == i.toString) === single, s"qid $i")
    }
    val withCells = IvfIndex.withCells(coll, centroids)
    val pruned = keyed(IvfIndex.searchManyPrunedAdaptive(withCells, config,
      centroids, queries, 5, ratio = 1.2, maxProbe = 4).collect())
    assert(pruned === batch)
    coll.unpersist()
  }

  test("filtered partitioned search: full probe == pre-filtered exact; predicate pushes to the scan") {
    import org.apache.spark.sql.functions.col
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val centroids = IvfIndex.train(coll, config, IvfIndex.IvfConfig(k = 8, iterations = 5))
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_flt").toString
    IvfIndex.writePartitioned(coll, centroids, path)
    val q = Tables.queryVector(spark, sfDir, 3L)
    val pred = col("id") >= "5"
    // post-filter semantics: full probe over the filtered layout equals
    // exact flat search over the pre-filtered collection
    val filtered = IvfIndex.searchPartitioned(spark, path, config, centroids,
      q, 10, nprobe = 8, filter = Some(pred))
    val exact = Search.flatSearch(coll.filter(pred), config, q, 10)
      .collect().map(_.getString(0)).toSeq
    assert(filtered.collect().map(_.getString(0)).toSeq === exact)
    // the predicate reaches the parquet reader as a pushed data filter
    // NEXT TO the probe partition filter — at 100 TB both prune IO
    val plan = filtered.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ivf_cell".r.findFirstIn(plan).isDefined, plan)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(id,5\\)".r
      .findFirstIn(plan).isDefined, plan)
    // batch path: every returned id satisfies the predicate, and with a
    // full probe each query's rows equal its single-query result
    import spark.implicits._
    val queries = Seq(("3", Tables.queryVector(spark, sfDir, 3L).toSeq),
      ("7", Tables.queryVector(spark, sfDir, 7L).toSeq)).toDF("qid", "qvector")
    val many = IvfIndex.searchManyPartitioned(spark, path, config, queries,
      10, nprobe = 8, filter = Some(pred)).collect()
    assert(many.forall(_.getAs[String]("id") >= "5"))
    assert(many.filter(_.getString(0) == "3").map(_.getAs[String]("id")).toSeq
      .sorted === exact.sorted)
    coll.unpersist()
  }

  test("IVF-bf16 layout: full probe == flat bf16; batch == single per query; directories prune") {
    import org.apache.spark.sql.functions.col
    import graft.ann.IvfBf16
    val d = Tables.dims(spark, sfDir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(spark, sfDir, config).cache()
    val centroids = IvfIndex.train(coll, config, IvfIndex.IvfConfig(k = 8, iterations = 5))
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_bf16").toString
    IvfBf16.writePartitioned(coll, centroids, path)
    // at rest: bf16 payload only (the f32 column is gone), cell dirs
    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted.toSeq === Seq("id", "ivf_cell", "value", "vector_bf16"))
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("ivf_cell=")) === 8)
    def key(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
      df.collect().map(r => (r.getAs[String]("id"), r.getAs[Double]("score"))).toSeq
    // full probe == the flat bf16 scan (same rounded-corpus contract)
    val q = Tables.queryVector(spark, sfDir, 2L)
    val flat = key(Search.flatSearchBf16(
      graft.prepare.Prepare.withBf16Vector(coll).select("id", "value", "vector_bf16"),
      config, q, 10))
    val full = key(IvfBf16.searchPartitioned(spark, path, config, q, 10, nprobe = 8))
    assert(full === flat)
    // batch == single per query at a PARTIAL probe; probe union prunes
    // directories (PartitionFilters on ivf_cell in the scan)
    import spark.implicits._
    val queries = Seq(("2", Tables.queryVector(spark, sfDir, 2L).toSeq),
      ("5", Tables.queryVector(spark, sfDir, 5L).toSeq)).toDF("qid", "qvector")
    val many = IvfBf16.searchManyPartitioned(spark, path, config, queries,
      10, nprobe = 3, knownNq = 2L)
    val plan = many.queryExecution.executedPlan.toString
    // BOTH scans prune: the bf16 distance scan AND the value-fetch join
    // (joining the unpruned frame there would re-read every directory)
    assert("PartitionFilters: \\[[^\\]]*ivf_cell".r.findAllIn(plan).size >= 2, plan)
    val rows = many.collect()
    for (qid <- Seq("2", "5")) {
      val qv = Tables.queryVector(spark, sfDir, qid.toLong)
      val single = key(IvfBf16.searchPartitioned(spark, path, config, qv, 10, nprobe = 3))
      val batch = rows.filter(_.getString(0) == qid)
        .map(r => (r.getAs[String]("id"), r.getAs[Double]("score"))).toSeq
      assert(batch.sorted === single.sorted, s"qid $qid")
    }
    // partial-probe quality on this corpus: ordered overlap vs bf16-exact
    val part = key(IvfBf16.searchPartitioned(spark, path, config, q, 10, nprobe = 3))
    assert(part.map(_._1).toSet.intersect(flat.map(_._1).toSet).size >= 5)
    coll.unpersist()
  }
}
