package graft

import graft.api.GraftDb

/** Compat facade flows (reference test/vector_db_test.exs shapes). */
class GraftDbSpec extends SparkSpec {

  test("textSearch + hybridRrfSearch over the value payload") {
    val db = new GraftDb(spark)
    db.createCollection("lexical", 2, metric = "cosine")
    db.batch("lexical", Seq(
      // good lexically AND by vector -> must win the fusion
      db.EmbeddingInput(id = "both", value = "spark engine spark",
        vector = Array(1f, 0f)),
      // lexical-only hit: vector points away from the query
      db.EmbeddingInput(id = "lexonly", value = "spark notes",
        vector = Array(-1f, 0f)),
      // vector-only hit: no query terms in the payload
      db.EmbeddingInput(id = "veconly", value = "other words here",
        vector = Array(0.95f, 0.05f)),
      db.EmbeddingInput(id = "neither", value = "unrelated content",
        vector = Array(0f, -1f))))
    val lex = db.textSearch("lexical", Seq("spark"), 10).collect()
    assert(lex.map(_.getString(0)).toSet === Set("both", "lexonly"))
    assert(lex.head.getString(0) === "both") // tf 2 in a short doc
    val fused = db.hybridRrfSearch("lexical", Seq("spark"),
      Array(1f, 0f), limit = 4)
    val order = fused.collect().map(_.getString(0)).toSeq
    assert(order.head === "both")
    assert(order.toSet === Set("both", "lexonly", "veconly", "neither"))
    // single-channel docs rank above the nowhere doc
    assert(order.indexOf("neither") === 3)
    db.close("lexical")
  }

  test("full compat flow: create, batch, get, search, delete, snapshot") {
    val db = new GraftDb(spark)
    db.createCollection("axes", 2, metric = "cosine")
    db.batch("axes", Seq(
      db.EmbeddingInput(id = "right", vector = Array(1f, 0f),
        metadata = Map("tag" -> "axis")),
      db.EmbeddingInput(id = "up", vector = Array(0f, 1f)),
      db.EmbeddingInput(id = "left", vector = Array(-1f, 0f))))
    assert(db.count("axes") === 3)
    assert(db.listCollections() === Seq("axes"))

    // duplicate id rejected atomically
    intercept[IllegalArgumentException] {
      db.batch("axes", Seq(db.EmbeddingInput(id = "right", vector = Array(1f, 1f))))
    }
    assert(db.count("axes") === 3)

    // point lookups
    assert(db.get("axes", "up").isDefined)
    assert(db.getByValue("axes", "left").get.getAs[String]("id") === "left")
    assert(db.getByVector("axes", Array(2f, 0f)).get.getAs[String]("id") === "right")

    // compat default score mode is :similarity -> cosine (raw+1)/2
    val hits = db.similaritySearch("axes", Array(1f, 0f), 2)
    assert(hits.map(_._1) === Seq("right", "up"))
    assert(hits.head._2 === 1.0)
    assert(hits(1)._2 === 0.5)

    // value defaults to id (ets.ex:284-288)
    assert(db.get("axes", "up").get.getAs[String]("value") === "up")

    // prepare_query compat: normalizes like ingest, rejects bad input
    assert(db.prepareQuery("axes", Array(2f, 0f)).toSeq === Seq(1f, 0f))
    intercept[IllegalArgumentException] {
      db.prepareQuery("axes", Array(1f, 2f, 3f)) // dimension mismatch
    }

    db.delete("axes", "left")
    assert(db.count("axes") === 2)

    val path = java.nio.file.Files.createTempDirectory("graft_db").toString
    db.snapshot("axes", path)
    db.close("axes")
    assert(db.listCollections().isEmpty)
    val loaded = db.loadSnapshot(path, Map("name" -> "axes2"))
    assert(loaded === "axes2")
    assert(db.count("axes2") === 2)
    // structural overrides rejected
    intercept[IllegalArgumentException] {
      db.loadSnapshot(path, Map("metric" -> "l2"))
    }
  }

  test("vectors-only records derive mean vector through the facade") {
    val db = new GraftDb(spark)
    db.createCollection("mv", 2, metric = "inner_product", score = "raw")
    db.batch("mv", Seq(db.EmbeddingInput(id = "doc",
      vectors = Seq(Array(1f, 0f), Array(0f, 1f)))))
    val row = db.get("mv", "doc").get
    assert(row.getAs[Seq[Float]]("vector") === Seq(0.5f, 0.5f))
    val res = db.multiVectorSearch("mv", Seq(Array(1f, 0f), Array(0f, 1f)), 1).collect()
    assert(res.head.getString(0) === "doc")
    assert(res.head.getDouble(2) === 2.0)
  }

  test("index routing: hnsw, lsh, ivf, sq8, pq, ivfpq collections agree with flat on top-1") {
    val db = new GraftDb(spark)
    val vecs = (0 until 50).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.13).toFloat, math.sin(i * 0.13).toFloat, (i % 5) / 4.0f)))
    for (idx <- Seq("flat", "hnsw", "lsh", "ivf", "sq8", "pq", "ivfpq")) {
      db.createCollection(s"c_$idx", 3, metric = "cosine", index = idx)
      db.batch(s"c_$idx", vecs)
    }
    val q = Array(1.0f, 0.1f, 0.2f)
    val flatTop = db.search("c_flat", q, 5).collect().map(_.getString(0))
    for (idx <- Seq("hnsw", "lsh", "ivf", "sq8", "pq", "ivfpq")) {
      val top = db.search(s"c_$idx", q, 5).collect().map(_.getString(0))
      assert(top.head === flatTop.head, s"index $idx top-1 disagrees with flat")
    }
    // write invalidates the ivf centroids (retrains on next search)
    db.batch("c_ivf", Seq(db.EmbeddingInput(id = "exactq", vector = q)))
    assert(db.search("c_ivf", q, 1).head.getString(0) === "exactq")
    // write invalidates the hnsw graph
    db.batch("c_hnsw", Seq(db.EmbeddingInput(id = "exactq", vector = q)))
    assert(db.search("c_hnsw", q, 1).head.getString(0) === "exactq")
    intercept[IllegalArgumentException] {
      db.createCollection("bad", 3, index = "btree")
    }
    // batch search routes by index; per-collection batch top-1 must
    // equal that collection's own single-query top-1 (c_ivf/c_hnsw now
    // contain the later-inserted exactq row)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val queries = Seq(("q0", q.toSeq)).toDF("qid", "qvector")
    for (idx <- Seq("flat", "lsh", "ivf", "sq8", "pq", "ivfpq")) {
      val batchTop = db.searchMany(s"c_$idx", queries, 3)
        .orderBy(col("distance").asc, col("id").asc)
        .collect().map(_.getAs[String]("id"))
      val singleTop = db.search(s"c_$idx", q, 1).collect().map(_.getString(0))
      assert(batchTop.head === singleTop.head, s"index $idx")
    }
  }

  test("filtered search routes through every index with post-filter semantics") {
    import org.apache.spark.sql.functions.{col, expr}
    // this test covers the INDEX filtered machinery itself — pin the
    // selective-filter exact routing off so the tiny corpus (every
    // predicate is "selective" at 60 rows) still exercises it
    spark.conf.set("spark.graft.filter.exactRoute", "false")
    try { filteredSearchAcrossIndexes() }
    finally spark.conf.unset("spark.graft.filter.exactRoute")
  }

  private def filteredSearchAcrossIndexes(): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    val db = new GraftDb(spark)
    val vecs = (0 until 60).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.11).toFloat, math.sin(i * 0.11).toFloat, (i % 7) / 6.0f)))
    for (idx <- Seq("flat", "hnsw", "lsh", "ivf", "sq8", "pq", "ivfpq"))  {
      db.createCollection(s"f_$idx", 3, metric = "cosine", index = idx)
      db.batch(s"f_$idx", vecs)
    }
    val q = Array(0.9f, 0.2f, 0.3f)
    // keep even ids only
    val pred = expr("cast(substring(id, 2, 2) as int) % 2 = 0")
    val exact = db.search("f_flat", q, 5, filter = Some(pred))
      .collect().map(_.getString(0)).toSeq
    val unfiltered = db.search("f_flat", q, 5).collect().map(_.getString(0))
    assert(exact !== unfiltered.toSeq, "predicate must change the answer")
    assert(exact.forall(_.drop(1).toInt % 2 == 0))
    for (idx <- Seq("hnsw", "lsh", "ivf", "sq8", "pq", "ivfpq")) {
      val top = db.search(s"f_$idx", q, 5, filter = Some(pred),
        oversample = 60).collect().map(_.getString(0)).toSeq
      assert(top.nonEmpty && top.forall(_.drop(1).toInt % 2 == 0),
        s"index $idx leaked: $top")
    }
    // where the candidate pool covers the corpus the filtered answer is
    // EXACT: hnsw beams are exhaustive at oversample=60 on 60 rows, and
    // the sq8/pq candidate budgets (20x limit) exceed the corpus before
    // the exact rerank
    for (idx <- Seq("hnsw", "sq8", "pq")) {
      val top = db.search(s"f_$idx", q, 5, filter = Some(pred),
        oversample = 60).collect().map(_.getString(0)).toSeq
      assert(top === exact, s"index $idx filtered top-5 disagrees")
    }
    // unfiltered search on the same collections is untouched by the
    // filtered calls (caches shared, semantics independent)
    assert(db.search("f_hnsw", q, 5).collect().map(_.getString(0)).toSeq
      === unfiltered.toSeq)
    // filtered BATCH search: same routing, same post-filter contract
    import spark.implicits._
    val queries = Seq(("q0", q.toSeq)).toDF("qid", "qvector")
    for (idx <- Seq("flat", "hnsw", "lsh", "ivf", "sq8", "pq", "ivfpq")) {
      val top = db.searchMany(s"f_$idx", queries, 5, filter = Some(pred),
        oversample = 60).collect().map(_.getAs[String]("id")).toSeq
      assert(top.nonEmpty && top.forall(_.drop(1).toInt % 2 == 0),
        s"batch index $idx leaked: $top")
    }
    assert(db.searchMany("f_flat", queries, 5, filter = Some(pred))
      .orderBy(col("distance").asc, col("id").asc)
      .collect().map(_.getAs[String]("id")).toSeq === exact)
  }

  test("selective filtered search routes to the exact scan: recall-1.0, contract-shaped, mutation-aware") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val db = new GraftDb(spark)
    val vecs = (0 until 400).map(i =>
      db.EmbeddingInput(id = f"s$i%03d", vector = Array(
        math.cos(i * 0.07).toFloat, math.sin(i * 0.07).toFloat,
        (i % 13) / 12.0f, (i % 5) / 4.0f)))
    for (idx <- Seq("flat", "ivf", "pq", "hnsw")) {
      db.createCollection(s"r_$idx", 4, metric = "cosine", index = idx)
      db.batch(s"r_$idx", vecs)
    }
    val q = Array(0.8f, 0.1f, 0.4f, 0.3f)
    // 40 of 400 rows match — selective under the 10k default cutoff
    val pred = expr("substring(id, 3, 1) = '0'")
    val ground = db.search("r_flat", q, 5, filter = Some(pred))
      .select("id", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    for (idx <- Seq("ivf", "pq", "hnsw")) {
      val top = db.search(s"r_$idx", q, 5, filter = Some(pred))
      assert(db.lastFilterRoute.get(s"r_$idx") === Some("exact-selective"),
        s"index $idx did not route")
      val got = top.select("id", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got === ground, s"routed $idx differs from the exact answer")
      // the routed result keeps each kind's result-column contract
      val expectedCols =
        if (idx == "hnsw") Seq("id", "score", "distance", "metric")
        else Seq("id", "value", "score", "distance", "metric", "metadata")
      assert(top.columns.toSeq === expectedCols, s"routed $idx schema")
    }
    // batch form routes too, per-qid identical to the single form
    val queries = Seq(("q0", q.toSeq), ("q1", vecs(42).vector.toSeq))
      .toDF("qid", "qvector")
    val batch = db.searchMany("r_ivf", queries, 5, filter = Some(pred))
      .collect().groupBy(_.getAs[String]("qid"))
    assert(db.lastFilterRoute.get("r_ivf") === Some("exact-selective"))
    for ((qid, qv) <- Seq("q0" -> q, "q1" -> vecs(42).vector)) {
      val single = db.search("r_ivf", qv, 5, filter = Some(pred))
        .select("id", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
      assert(batch(qid).map(r =>
          (r.getAs[String]("id"), r.getAs[Double]("score")))
        .toSeq.sortBy(_._1) === single, s"routed batch != single for $qid")
    }
    // pin the cutoff below the match count to prove the knob gates the
    // route (at 400 rows every predicate is "selective" under the 10k
    // default — exactly the regime the gate exists for)
    spark.conf.set("spark.graft.filter.exactMaxMatches", "10")
    try {
      db.search("r_ivf", q, 5, filter = Some(pred), oversample = 60).collect()
      assert(db.lastFilterRoute.get("r_ivf") === Some("index"),
        "cutoff below the match count must route to the index path")
    } finally spark.conf.unset("spark.graft.filter.exactMaxMatches")
    // a mutation invalidates the cached verdict: a NEW matching row
    // nearest to q must surface through the routed path immediately
    db.insert("r_ivf", db.EmbeddingInput(id = "sx0x",
      vector = Array(0.8f, 0.1f, 0.4f, 0.3f)))
    val afterPut = db.search("r_ivf", q, 5,
      filter = Some(expr("substring(id, 3, 1) = '0'")))
      .collect().map(_.getString(0)).toSeq
    assert(db.lastFilterRoute.get("r_ivf") === Some("exact-selective"))
    assert(afterPut.head === "sx0x", s"routed search missed the new row: $afterPut")
    // ivfbf16: the routed exact scan keeps the bf16-ROUNDED contract —
    // identical to a wide-open-probe filtered search on the same kind
    db.createCollection("r_ibf", 4, metric = "cosine", index = "ivfbf16")
    db.batch("r_ibf", vecs)
    val routedIbf = db.search("r_ibf", q, 5, filter = Some(pred))
      .select("id", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(db.lastFilterRoute.get("r_ibf") === Some("exact-selective"))
    spark.conf.set("spark.graft.filter.exactRoute", "false")
    spark.conf.set("spark.graft.ivf.ratio", "1e9")
    spark.conf.set("spark.graft.ivf.maxProbe", "64")
    try {
      val fullProbe = db.search("r_ibf", q, 5, filter = Some(pred))
        .select("id", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(db.lastFilterRoute.get("r_ibf") === Some("index"))
      assert(routedIbf === fullProbe,
        "routed ivfbf16 broke the rounded-rank contract")
    } finally {
      spark.conf.unset("spark.graft.filter.exactRoute")
      spark.conf.unset("spark.graft.ivf.ratio")
      spark.conf.unset("spark.graft.ivf.maxProbe")
    }
    (Seq("flat", "ivf", "pq", "hnsw").map("r_" + _) :+ "r_ibf")
      .foreach(db.close)
  }

  test("advise: sample-bounded cross-kind measurement, ranked, exact kinds at overlap 1.0, no residue") {
    val db = new GraftDb(spark)
    val vecs = (0 until 300).map(i =>
      db.EmbeddingInput(id = f"a$i%03d", vector = Array(
        math.cos(i * 0.31).toFloat, math.sin(i * 0.37).toFloat,
        (i % 17) / 16.0f, (i % 6) / 5.0f)))
    db.createCollection("adv", 4, metric = "cosine", index = "flat")
    db.batch("adv", vecs)
    val kinds = Seq("flat", "ivf", "pq", "hnsw")
    val advice = db.advise("adv", limit = 5, sampleRows = 200,
      sampleQueries = 4, kinds = kinds)
    assert(advice.map(_.index).toSet === kinds.toSet,
      s"one row per kind expected: $advice")
    advice.foreach { a =>
      assert(a.overlap >= 0.0 && a.overlap <= 1.0, s"overlap range: $a")
      assert(a.fill >= 0.0 && a.fill <= 1.0, s"fill range: $a")
      assert(a.buildSeconds > 0.0 && a.perQuerySeconds > 0.0, s"times: $a")
    }
    // flat is exact on its own ground truth; pq/hnsw rerank exactly or
    // cover the 200-row sample, so the whole panel should sit at 1.0 —
    // but the CONTRACT is only that exact kinds measure 1.0
    assert(advice.find(_.index == "flat").get.overlap === 1.0)
    // ranked best-first: overlap desc, then warm per-query cost asc
    assert(advice === advice.sortBy(a => (-a.overlap, a.perQuerySeconds)))
    // the throwaway sample collections are gone
    assert(db.listCollections().forall(!_.startsWith("__advise__")))
    // a metric-rejected kind is skipped, not an error
    db.createCollection("adv_ip", 4, metric = "inner_product", index = "flat")
    db.batch("adv_ip", vecs)
    val ipAdvice = db.advise("adv_ip", limit = 5, sampleRows = 100,
      sampleQueries = 4, kinds = Seq("flat", "vamana"))
    assert(ipAdvice.map(_.index) === Seq("flat"),
      s"vamana must be skipped under inner-product: $ipAdvice")
    db.close("adv"); db.close("adv_ip")
  }

  test("embeddingDrift: self is zero, sector-collapsed batch flagged, any kind served through the shared cell cache") {
    import org.apache.spark.sql.functions.{sum => fsum}
    import spark.implicits._
    val db = new GraftDb(spark)
    val vecs = (0 until 240).map { i =>
      val a = i * 0.262
      db.EmbeddingInput(id = f"d$i%03d", vector = Array(
        math.cos(a).toFloat, math.sin(a).toFloat,
        ((i % 13) / 12.0f) - 0.5f, ((i % 7) / 6.0f) - 0.5f))
    }
    db.createCollection("drift", 4, metric = "cosine", index = "ivf")
    db.batch("drift", vecs)
    // the current batch arrives RAW — the facade normalizes it through
    // the same pipeline the put path used, so self-drift is exactly zero
    val raw = vecs.map(v => Tuple1(v.vector)).toDF("vector")
    val self = db.embeddingDrift("drift", raw)
    assert(self.columns.toSeq === Seq("cell", "ref_frac", "cur_frac", "psi_term"))
    assert(self.collect().forall(_.getDouble(3) === 0.0),
      "the corpus against itself must be exactly zero drift")
    // a batch collapsed onto one angular sector: embedding-space drift
    // no scalar column monitor would see
    val biased = vecs.filter(_.vector(0) > 0.8f)
      .map(v => Tuple1(v.vector)).toDF("vector")
    val psi = db.embeddingDrift("drift", biased)
      .agg(fsum("psi_term")).head.getDouble(0)
    assert(psi > 0.25, s"sector-collapsed batch must flag as drifted: $psi")
    // a flat collection has no serving quantizer: a default IVF trains
    // once through the same cache the probe paths share
    db.createCollection("drift_flat", 4, metric = "cosine", index = "flat")
    db.batch("drift_flat", vecs)
    val p2 = db.embeddingDrift("drift_flat", raw)
      .agg(fsum("psi_term")).head.getDouble(0)
    assert(p2 === 0.0, s"flat-kind self drift: $p2")
    db.close("drift"); db.close("drift_flat")
  }

  test("searchAfter: cursor pages tile the exact ranking across rank ties; filtered pages; exhausted cursor empty") {
    import org.apache.spark.sql.functions.expr
    val db = new GraftDb(spark)
    // 9 rows, three sharing ONE vector: a rank tie the id order resolves
    val tied = Array(0.5f, 0.5f, 0f, 0f)
    val vecs = (0 until 6).map(i =>
      db.EmbeddingInput(id = f"v$i", vector = Array(
        math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        0.1f * i, 0.2f))) ++
      Seq("t1", "t2", "t3").map(id => db.EmbeddingInput(id = id, vector = tied))
    db.createCollection("page", 4, metric = "cosine", index = "flat")
    db.batch("page", vecs)
    val q = Array(1f, 0.2f, 0f, 0f)
    def key(r: org.apache.spark.sql.Row) = (r.getAs[String]("id"),
      r.getAs[Double]("score"), r.getAs[Double]("distance"))
    val all = db.search("page", q, 9).collect().map(key)
    // the tied rows rank identically, so they must sit consecutively
    // in id order — the exact shape a naive cursor gets wrong
    val ti = all.indexWhere(_._1 == "t1")
    assert(all.slice(ti, ti + 3).map(_._1).toSeq === Seq("t1", "t2", "t3"))
    var cursor: Option[(Double, Any)] = None
    val pages = Seq(3, 3, 3).flatMap { n =>
      val p = db.searchAfter("page", q, n, cursor).collect()
      assert(p.length === n, "full pages until the ranking is exhausted")
      cursor = Some((p.last.getAs[Double]("distance"), p.last.getAs[String]("id")))
      p.map(key)
    }
    assert(pages.toSeq === all.toSeq, "pages must tile the exact ranking")
    assert(db.searchAfter("page", q, 3, cursor).collect().isEmpty,
      "a cursor past the last row yields an empty page")
    // filtered pagination pages the FILTERED ranking
    val pred = Some(expr("id like 'v%'"))
    val fAll = db.searchAfter("page", q, 6, None, pred).collect().map(key)
    val f1 = db.searchAfter("page", q, 3, None, pred).collect()
    val fc = Some((f1.last.getAs[Double]("distance"),
      f1.last.getAs[String]("id"): Any))
    val f2 = db.searchAfter("page", q, 3, fc, pred).collect()
    assert((f1.map(key) ++ f2.map(key)).toSeq === fAll.toSeq)
    db.close("page")
  }

  test("deleteIndexed: bounded cell rewrite, untouched cells byte-identical, idempotent, re-ingest ok, graphs rejected") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val db = new GraftDb(spark)
    val vecs = (0 until 80).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.13).toFloat, math.sin(i * 0.17).toFloat,
        (i % 7) / 6.0f, (i % 3) / 2.0f)))
    val q = Array(0.9f, 0.2f, 0.3f, 0.1f)
    db.createCollection("del_ivf", 4, metric = "cosine", index = "ivf")
    db.batch("del_ivf", vecs)
    val path = java.nio.file.Files.createTempDirectory("graft_del_ivf").toString
    db.persistIndex("del_ivf", path)
    db.close("del_ivf")
    val db2 = new GraftDb(spark)
    db2.openIndexed("del_ivf", path)
    // pick two ids that live in ONE cell, so exactly one directory
    // rewrites; fingerprint every data file first
    val layout = spark.read.parquet(path).select("id", "ivf_cell")
      .collect().map(r => r.getString(0) -> r.getInt(1))
    val (cell, members) = layout.groupBy(_._2).maxBy(_._2.length)
    val doomed = members.take(2).map(_._1).toSeq
    def files(): Map[String, (Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
        fs.listStatus(p).toSeq.flatMap(st =>
          if (st.isDirectory) walk(st.getPath) else Seq(st))
      walk(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.toString ->
          ((st.getLen, st.getModificationTime))).toMap
    }
    val before = files()
    assert(db2.deleteIndexed("del_ivf", doomed) === 2L)
    // gone from search, CRUD, and the at-rest layout
    assert(db2.count("del_ivf") === 78L)
    val wide = db2.search("del_ivf", q, 80,
      recallTarget = 0.0).collect().map(_.getString(0)).toSet
    assert(doomed.forall(!wide.contains(_)), "deleted ids still served")
    assert(spark.read.parquet(path).filter(col("id").isin(doomed: _*)).count() === 0L)
    // ONLY the affected cell directory rewrote
    val after = files()
    val untouchedBefore = before.filter(!_._1.contains(s"ivf_cell=$cell"))
    val untouchedAfter = after.filter(!_._1.contains(s"ivf_cell=$cell"))
    assert(untouchedAfter === untouchedBefore,
      "untouched cell directories must keep their files byte-identical")
    assert(before.keys.exists(_.contains(s"ivf_cell=$cell")))
    // idempotent: replaying the delete removes nothing
    assert(db2.deleteIndexed("del_ivf", doomed) === 0L)
    // a deleted id is free for re-ingest through the persisted model
    db2.appendIndexed("del_ivf",
      Seq((doomed.head, vecs.head.vector.toSeq)).toDF("id", "vector"))
    assert(db2.count("del_ivf") === 79L)
    // non-partitioned layout (flat parquet dir) deletes too
    db.createCollection("del_flat", 4, metric = "cosine", index = "flat")
    db.batch("del_flat", vecs)
    val fpath = java.nio.file.Files.createTempDirectory("graft_del_flat").toString
    db.persistIndex("del_flat", fpath)
    db.close("del_flat")
    val db3 = new GraftDb(spark)
    db3.openIndexed("del_flat", fpath)
    assert(db3.deleteIndexed("del_flat", Seq("v00", "zzz")) === 1L)
    assert(db3.count("del_flat") === 79L)
    // graph layouts carry adjacency: delete = rebuild, not a rewrite
    db.createCollection("del_hnsw", 4, metric = "cosine", index = "hnsw")
    db.batch("del_hnsw", vecs)
    val hpath = java.nio.file.Files.createTempDirectory("graft_del_hnsw").toString
    db.persistIndex("del_hnsw", hpath)
    db.close("del_hnsw")
    val db4 = new GraftDb(spark)
    db4.openIndexed("del_hnsw", hpath)
    intercept[IllegalArgumentException] {
      db4.deleteIndexed("del_hnsw", Seq("v00"))
    }
    db2.close("del_ivf"); db3.close("del_flat"); db4.close("del_hnsw")
  }

  test("persistIndex/openIndexed lifecycle: cold open serves without retraining, results identical") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val db = new GraftDb(spark)
    val vecs = (0 until 60).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.13).toFloat, math.sin(i * 0.17).toFloat,
        (i % 7) / 6.0f, (i % 3) / 2.0f)))
    val q = Array(0.9f, 0.2f, 0.3f, 0.1f)
    val queries = Seq(("q0", q.toSeq)).toDF("qid", "qvector")
    // ivfpq on cosine = raw codes; on l2 = residual codes; both roads
    for ((idx, metric) <- Seq("lsh" -> "cosine", "ivf" -> "cosine",
        "sq8" -> "l2", "pq" -> "cosine", "apq" -> "cosine",
        "ivfpq" -> "l2", "ivfpq" -> "cosine",
        "hnsw" -> "cosine", "vamana" -> "cosine", "vamana" -> "l2",
        "flat" -> "cosine", "bf16" -> "cosine",
        "ivfbf16" -> "cosine", "rabitq" -> "cosine",
        "ivfrabitq" -> "l2", "ivfrabitq" -> "cosine")) {
      val name = s"p_${idx}_$metric"
      db.createCollection(name, 4, metric = metric, index = idx)
      db.batch(name, vecs)
      val before = db.search(name, q, 5).select("id", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      val path = java.nio.file.Files.createTempDirectory(s"graft_pi_$idx").toString
      db.persistIndex(name, path)
      // COLD open: fresh handle, nothing cached, models from sidecars
      val db2 = new GraftDb(spark)
      db2.openIndexed(name, path)
      val after = db2.search(name, q, 5).select("id", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(after === before, s"$name cold-open search differs")
      // CRUD sees canonical columns only (codes stay in the caches)
      assert(db2.all(name).columns.toSet.subsetOf(
        graft.prepare.Prepare.canonicalSchema.fieldNames.toSet), s"$name leaks index columns")
      assert(db2.count(name) === 60L, name)
      // batch search serves off the same loaded artifacts
      if (idx != "flat") {
        val batch = db2.searchMany(name, queries, 1)
        val batchTop = batch.collect().map(_.getAs[String]("id")).toSeq
        val singleTop = db2.search(name, q, 1).collect().map(_.getString(0)).toSeq
        assert(batchTop === singleTop, s"$name batch/single disagree after open")
        // opened cell-partitioned collections route batch search through
        // the at-rest layout with a STATIC probe-union partition filter
        if (idx == "ivf" || idx == "ivfpq" || idx == "ivfbf16" ||
            idx == "ivfrabitq") {
          val plan = batch.queryExecution.executedPlan.toString
          assert("PartitionFilters: \\[[^\\]]*ivf_cell".r.findFirstIn(plan).isDefined,
            s"$name batch after open does not statically prune cells:\n$plan")
        }
      }
    }
    // re-persist over the same path is an overwrite, not an append
    val rpPath = java.nio.file.Files.createTempDirectory("graft_pi_rw").toString
    db.createCollection("p_rw", 4, metric = "l2", index = "sq8")
    db.batch("p_rw", vecs)
    db.persistIndex("p_rw", rpPath)
    db.persistIndex("p_rw", rpPath)
    val db3 = new GraftDb(spark)
    db3.openIndexed("p_rw", rpPath)
    assert(db3.count("p_rw") === 60L)
    // name conflicts and missing paths fail cleanly
    intercept[IllegalArgumentException] { db3.openIndexed("p_rw", rpPath) }
    intercept[Exception] {
      new GraftDb(spark).openIndexed("ghost", "/tmp/graft_pi_does_not_exist")
    }
  }

  test("bf16 facade kind: rounded-exact search, vector-free at-rest layout, decoded CRUD") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val db = new GraftDb(spark)
    val vecs = (0 until 40).map(i =>
      db.EmbeddingInput(id = f"b$i%02d", vector = Array(
        math.cos(i * 0.21).toFloat, math.sin(i * 0.21).toFloat,
        (i % 9) / 8.0f, 1.0f / (i + 1))))
    val q = Array(0.6f, 0.4f, 0.55f, 0.2f)
    db.createCollection("bf", 4, metric = "cosine", index = "bf16")
    db.batch("bf", vecs)
    // facade routing == the low-level bf16 scan over the packed frame
    val cfg = graft.core.CollectionConfig("bf", 4,
      graft.core.Metric.Cosine, None, graft.core.ScoreMode.Similarity, "bf16")
    val direct = graft.search.Search.flatSearchBf16(
        graft.prepare.Prepare.withBf16Vector(db.all("bf")), cfg, q, 5)
      .select("id", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaDb = db.search("bf", q, 5).select("id", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaDb === direct, "facade bf16 routing differs from Search.flatSearchBf16")
    // in-memory batch parity (the persist loop covers the opened form)
    val queries = Seq(("q0", q.toSeq), ("q1", vecs(7).vector.toSeq))
      .toDF("qid", "qvector")
    val batch = db.searchMany("bf", queries, 5).collect()
      .groupBy(_.getAs[String]("qid"))
    assert(batch("q0").map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
      .toSeq.sortBy(_._1) === viaDb.sortBy(_._1), "bf16 batch != single")
    // filtered search: exact top-k among matching rows only
    val filt = db.search("bf", q, 3, filter = Some(col("id") =!= viaDb.head._1))
      .collect().map(_.getString(0)).toSeq
    assert(!filt.contains(viaDb.head._1) && filt.nonEmpty, "bf16 filter ignored")
    // at-rest layout: NO f32 column (that is the point), packed present
    val path = java.nio.file.Files.createTempDirectory("graft_bf16").toString
    db.persistIndex("bf", path)
    val onDisk = spark.read.parquet(path)
    assert(!onDisk.columns.contains("vector"), "bf16 layout leaks the f32 column")
    assert(onDisk.columns.contains("vector_bf16"))
    // CRUD on the reopened collection serves the DECODED rounded corpus
    val db2 = new GraftDb(spark)
    db2.openIndexed("bf2", path)
    val gotRow = db2.get("bf2", "b07").get
    val got = gotRow.getSeq[Float](gotRow.fieldIndex("vector"))
    val expected = graft.prepare.Prepare.withBf16Vector(db.all("bf"))
      .filter(col("id") === "b07")
      .select(graft.functions.VectorFunctions.unpackBf16(col("vector_bf16")))
      .head.getSeq[Float](0)
    assert(got === expected, "reopened bf16 CRUD vector is not the decoded corpus")
    db.close("bf"); db2.close("bf2")
  }

  test("ivfbf16 facade kind: wide-open probes == flat bf16 exact; batch == single; recallTarget resolves knobs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val db = new GraftDb(spark)
    val vecs = (0 until 80).map(i =>
      db.EmbeddingInput(id = f"c$i%02d", vector = Array(
        math.cos(i * 0.23).toFloat, math.sin(i * 0.29).toFloat,
        (i % 11) / 10.0f, (i % 5) / 4.0f)))
    val q = Array(0.55f, -0.35f, 0.6f, 0.25f)
    db.createCollection("ibf", 4, metric = "cosine", index = "ivfbf16")
    db.batch("ibf", vecs)
    db.createCollection("ibf_flat", 4, metric = "cosine", index = "bf16")
    db.batch("ibf_flat", vecs)
    val bf16Exact = db.search("ibf_flat", q, 5).select("id", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // wide-open adaptive knobs probe every cell: the rounded-exact anchor
    spark.conf.set("spark.graft.ivf.ratio", "1e9")
    spark.conf.set("spark.graft.ivf.maxProbe", "64")
    try {
      val full = db.search("ibf", q, 5).select("id", "score")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(full === bf16Exact, "full-probe ivfbf16 differs from the flat bf16 scan")
    } finally {
      spark.conf.unset("spark.graft.ivf.ratio")
      spark.conf.unset("spark.graft.ivf.maxProbe")
    }
    // default adaptive knobs: single and batch stay per-query identical
    val queries = Seq(("q0", q.toSeq), ("q1", vecs(13).vector.toSeq))
      .toDF("qid", "qvector")
    val batch = db.searchMany("ibf", queries, 5).collect()
      .groupBy(_.getAs[String]("qid"))
    for ((qid, qv) <- Seq("q0" -> q, "q1" -> vecs(13).vector)) {
      val single = db.search("ibf", qv, 5).select("id", "score")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
      val got = batch(qid)
        .map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
        .toSeq.sortBy(_._1)
      assert(got === single, s"ivfbf16 batch != single for $qid")
    }
    // filtered search: the excluded id never surfaces
    val top1 = db.search("ibf", q, 1).head.getString(0)
    val filt = db.search("ibf", q, 3, filter = Some(col("id") =!= top1))
      .collect().map(_.getString(0)).toSeq
    assert(!filt.contains(top1) && filt.nonEmpty, "ivfbf16 filter ignored")
    // recallTarget: the measured nprobe ladder resolves a full-fill point
    // and the resolved knobs DELIVER vs the rounded-exact anchor
    val p = db.knobsFor("ibf", recallTarget = 1.0, limit = 5)
    assert(p.nprobe >= 1 && p.fill >= 0.999, s"ladder point $p")
    val viaTarget = db.searchMany("ibf", Seq(("q0", q.toSeq)).toDF("qid", "qvector"),
        5, knownNq = 1L, recallTarget = 1.0)
      .collect().map(_.getAs[String]("id")).toSet
    assert(bf16Exact.map(_._1).toSet.subsetOf(viaTarget),
      s"recallTarget knobs under-deliver: $viaTarget")
    db.close("ibf"); db.close("ibf_flat")
  }

  test("l2 ivfpq facade defaults to residual codes; batch agrees with single") {
    val db = new GraftDb(spark)
    db.createCollection("resq", 3, metric = "l2", index = "ivfpq")
    db.batch("resq", (0 until 50).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.13).toFloat, math.sin(i * 0.13).toFloat, (i % 5) / 4.0f))))
    val q = Array(1.0f, 0.1f, 0.2f)
    db.createCollection("resq_flat", 3, metric = "l2", index = "flat")
    db.batch("resq_flat", (0 until 50).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.13).toFloat, math.sin(i * 0.13).toFloat, (i % 5) / 4.0f))))
    val flatTop = db.search("resq_flat", q, 1).head.getString(0)
    assert(db.search("resq", q, 1).head.getString(0) === flatTop)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val queries = Seq(("q0", q.toSeq)).toDF("qid", "qvector")
    val batchTop = db.searchMany("resq", queries, 3)
      .orderBy(col("distance").asc, col("id").asc).head.getAs[String]("id")
    assert(batchTop === flatTop)
  }

  test("appendIndexed: opened layouts ingest new rows without retraining; search/batch/CRUD all see them") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val db = new GraftDb(spark)
    def mkVecs(d: GraftDb) = (0 until 60).map(i =>
      d.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.13).toFloat, math.sin(i * 0.17).toFloat,
        (i % 7) / 6.0f, (i % 3) / 2.0f)))
    val vecs = mkVecs(db)
    // the appended row sits exactly on the query point: every family
    // must surface it once the append is visible. RAW (id, vector)
    // input — appendIndexed runs the same prepare/validate as put_many
    val q = Array(0.31f, -0.47f, 0.83f, 0.11f)
    val rawRows = Seq(
      ("x_hit", q.toSeq), ("x_far", Seq(-0.9f, 0.8f, -0.7f, 0.6f)))
      .toDF("id", "vector")
    val queries = Seq(("q0", q.toSeq)).toDF("qid", "qvector")
    for ((idx, metric) <- Seq("lsh" -> "cosine", "ivf" -> "cosine",
        "sq8" -> "l2", "pq" -> "cosine", "apq" -> "cosine",
        "ivfpq" -> "l2", "ivfpq" -> "cosine",
        "hnsw" -> "cosine", "vamana" -> "cosine", "vamana" -> "l2",
        "flat" -> "cosine", "bf16" -> "cosine",
        "ivfbf16" -> "cosine", "rabitq" -> "cosine",
        "ivfrabitq" -> "l2", "ivfrabitq" -> "cosine")) {
      val name = s"ap_${idx}_$metric"
      db.createCollection(name, 4, metric = metric, index = idx)
      db.batch(name, vecs)
      val path = java.nio.file.Files.createTempDirectory(s"graft_ai_$idx").toString
      db.persistIndex(name, path)
      val db2 = new GraftDb(spark)
      db2.openIndexed(name, path)
      db2.appendIndexed(name, rawRows)
      assert(db2.count(name) === 62L, s"$name count after append")
      assert(db2.get(name, "x_hit").isDefined, s"$name CRUD misses appended row")
      val top = db2.search(name, q, 5).collect().map(_.getString(0)).toSeq
      assert(top.contains("x_hit"), s"$name single search misses appended row: $top")
      if (idx != "flat") {
        val batchTop = db2.searchMany(name, queries, 1)
          .collect().map(_.getAs[String]("id")).toSeq
        val singleTop = db2.search(name, q, 1).collect().map(_.getString(0)).toSeq
        assert(batchTop === singleTop, s"$name batch/single disagree after append")
      }
      // compaction of the appended layout: nothing observable changes
      // (for flat-dir layouts this also proves the config/model sidecars
      // survive the rewrite — the re-capture reloads them from disk)
      assert(db2.compactIndexed(name) >= 1, name)
      assert(db2.count(name) === 62L, s"$name count after compact")
      assert(db2.search(name, q, 5).collect().map(_.getString(0)).toSeq === top,
        s"$name search after compact")
      // duplicate ids are rejected, like put_many — against the layout
      // AND within the batch itself
      val dup = intercept[IllegalArgumentException] {
        db2.appendIndexed(name, rawRows.filter(col("id") === "x_hit"))
      }
      assert(dup.getMessage.contains("duplicate"), name)
      val inBatch = intercept[IllegalArgumentException] {
        db2.appendIndexed(name,
          Seq(("x_twice", q.toSeq), ("x_twice", q.toSeq)).toDF("id", "vector"))
      }
      assert(inBatch.getMessage.contains("duplicate"), name)
      // invalid rows are rejected whole-batch, like put_many
      val badDim = intercept[IllegalArgumentException] {
        db2.appendIndexed(name, Seq(("x_bad", Seq(1f))).toDF("id", "vector"))
      }
      assert(badDim.getMessage.contains("invalid"), name)
      // a CRUD mutation diverges memory from disk: append must refuse
      // rather than resurrect the deleted row from the layout
      db2.delete(name, "x_far")
      val stale = intercept[IllegalArgumentException] {
        db2.appendIndexed(name, rawRows.limit(0))
      }
      assert(stale.getMessage.contains("at-rest"), name)
      db2.close(name)
    }
    // collections never opened from a layout refuse appendIndexed
    val db3 = new GraftDb(spark)
    db3.createCollection("ai_mem", 4, index = "flat")
    db3.batch("ai_mem", mkVecs(db3).take(3))
    val e = intercept[IllegalArgumentException] {
      db3.appendIndexed("ai_mem", db3.all("ai_mem").limit(0))
    }
    assert(e.getMessage.contains("at-rest"))
  }

  test("facade ivf defaults to adaptive probing; spark.graft.ivf.adaptive=false opts back to fixed nprobe") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val db = new GraftDb(spark)
    db.createCollection("adp", 4, metric = "cosine", index = "ivf")
    db.batch("adp", (0 until 80).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(
        math.cos(i * 0.11).toFloat, math.sin(i * 0.19).toFloat,
        (i % 9) / 8.0f, (i % 4) / 3.0f))))
    val q = Array(0.7f, -0.3f, 0.5f, 0.2f)
    val queries = Seq(("q0", q.toSeq)).toDF("qid", "qvector")
    // no conf set: the DEFAULT is adaptive (ratio 1.5, maxProbe 8)
    val byDefault = db.search("adp", q, 5).collect().map(_.getString(0)).toSeq
    // explicit opt-out routes through the fixed-nprobe path
    spark.conf.set("spark.graft.ivf.adaptive", "false")
    val fixed = try db.search("adp", q, 5).collect().map(_.getString(0)).toSeq
      finally spark.conf.unset("spark.graft.ivf.adaptive")
    spark.conf.set("spark.graft.ivf.adaptive", "true")
    try {
      // wide-open knobs degenerate to exact flat — the equivalence anchor
      spark.conf.set("spark.graft.ivf.ratio", "1e9")
      spark.conf.set("spark.graft.ivf.maxProbe", "16")
      db.createCollection("adp_flat", 4, metric = "cosine", index = "flat")
      db.batch("adp_flat", (0 until 80).map(i =>
        db.EmbeddingInput(id = f"v$i%02d", vector = Array(
          math.cos(i * 0.11).toFloat, math.sin(i * 0.19).toFloat,
          (i % 9) / 8.0f, (i % 4) / 3.0f))))
      val exact = db.search("adp_flat", q, 5).collect().map(_.getString(0)).toSeq
      assert(db.search("adp", q, 5).collect().map(_.getString(0)).toSeq === exact)
      // tight knobs: single and batch stay per-query identical
      spark.conf.set("spark.graft.ivf.ratio", "1.2")
      spark.conf.set("spark.graft.ivf.maxProbe", "4")
      val single = db.search("adp", q, 5).collect().map(_.getString(0)).toSeq
      val batch = db.searchMany("adp", queries, 5)
        .orderBy(col("distance").asc, col("id").asc)
        .collect().map(_.getAs[String]("id")).toSeq
      assert(batch === single)
    } finally {
      spark.conf.unset("spark.graft.ivf.adaptive")
      spark.conf.unset("spark.graft.ivf.ratio")
      spark.conf.unset("spark.graft.ivf.maxProbe")
    }
    // conf cleared: back to the adaptive default, and the wide-open
    // adaptive run above proved it can only widen probes vs fixed
    assert(db.search("adp", q, 5).collect().map(_.getString(0)).toSeq === byDefault)
    // the opt-out actually exercised the fixed path (results exist)
    assert(fixed.nonEmpty)
  }

  test("hnsw over the row cap: facade falls back to sharded, direct build refuses") {
    val db = new GraftDb(spark)
    db.createCollection("capped", 3, metric = "l2", index = "hnsw")
    db.batch("capped", (0 until 20).map(i =>
      db.EmbeddingInput(id = f"v$i%02d", vector = Array(i.toFloat, 0f, 0f))))
    spark.conf.set("spark.graft.hnsw.maxBuildRows", "10")
    try {
      // facade search no longer errors: it serves the query through
      // per-shard executor graphs (ShardedHnswSpec covers the mechanics)
      assert(db.search("capped", Array(1f, 0f, 0f), 1).head.getString(0) === "v01")
      // the raw driver builder keeps the hard cap + actionable message
      val config = graft.core.CollectionConfig("capped", 3, graft.core.Metric.L2)
      val e = intercept[IllegalArgumentException] {
        graft.index.Hnsw.build(db.all("capped"), config)
      }
      assert(e.getMessage.contains("ivfpq"))
    } finally spark.conf.unset("spark.graft.hnsw.maxBuildRows")
    // under the cap the driver graph serves the same answer
    assert(db.search("capped", Array(1f, 0f, 0f), 1).head.getString(0) === "v01")
  }

  test("hybrid and rerank through the facade") {
    val db = new GraftDb(spark)
    db.createCollection("h", 3, metric = "l2", score = "raw")
    db.batch("h", Seq(
      db.EmbeddingInput(id = "exact", vector = Array(1f, 0f, 0f)),
      db.EmbeddingInput(id = "near", vector = Array(1f, 0.1f, 0f)),
      db.EmbeddingInput(id = "far", vector = Array(-1f, -1f, -1f))))
    val hy = db.hybridSearch("h", Array(1f, 0f, 0f), 2, candidates = 3)
      .collect().map(_.getString(0))
    assert(hy.toSeq === Seq("exact", "near"))
    val rr = db.rerank("h", Array(1f, 0f, 0f), alpha = 1.0, finalK = 2, candidates = 3)
      .collect().map(_.getString(0))
    assert(rr.toSeq === Seq("exact", "near"))
  }

  test("recallTarget=0.9 resolves measured knobs meeting the target for ivf, pq, ivfpq, hnsw") {
    val db = new GraftDb(spark)
    val dims = 16
    // deterministic clustered corpus: 20 topics x 10 members, member j
    // blends (1-0.03j) topic base with 0.03j its own vector — the
    // retrieval regime where ANN knobs actually trade recall for cost
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(d => math.sin(seed * 13.37 + d * 0.71).toFloat)
    val rows = for (t <- 0 until 20; j <- 0 until 10) yield {
      val base = vec(1000 + t); val own = vec(5000 + t * 10 + j)
      db.EmbeddingInput(id = f"d$t%02d_$j%02d", vector =
        Array.tabulate(dims)(i => (1.0f - 0.03f * j) * base(i) + 0.03f * j * own(i)))
    }
    // probe queries are PERTURBED topic bases, not stored vectors — so
    // the assertion checks generalization past the calibration sample
    import spark.implicits._
    val qs = (0 until 4).map { t =>
      val b = vec(1000 + t); val n = vec(9000 + t)
      (s"q$t", Array.tabulate(dims)(i => b(i) + 0.02f * n(i)).toSeq)
    }.toDF("qid", "qvector")
    db.createCollection("rt_flat", dims, metric = "cosine", index = "flat")
    db.batch("rt_flat", rows)
    def topIds(res: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
      res.select("qid", "id").collect().groupBy(_.getString(0))
        .map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }
    val exact = topIds(db.searchMany("rt_flat", qs, 10, knownNq = 4))
    for (idx <- Seq("ivf", "pq", "ivfpq", "hnsw", "vamana", "sq8", "bf16",
        "ivfbf16", "rabitq", "ivfrabitq")) {
      val name = s"rt_$idx"
      db.createCollection(name, dims, metric = "cosine", index = idx)
      db.batch(name, rows)
      val point = db.knobsFor(name, 0.9)
      assert(point.overlap >= 0.9,
        s"$idx measured curve ceiling ${point.overlap} below target")
      val got = topIds(db.searchMany(name, qs, 10, knownNq = 4, recallTarget = 0.9))
      val overlaps = exact.toSeq.map { case (q, ex) =>
        ex.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ex.size }
      val mean = overlaps.sum / overlaps.size
      assert(mean >= 0.9, s"$idx recallTarget=0.9 delivered $mean on probe queries")
      // the curve is monotone in cost order up to measurement noise;
      // its cheapest point is reported with its own measured overlap
      val curve = db.overlapCurve(name)
      assert(curve.nonEmpty && curve.last.overlap >= curve.head.overlap - 0.2)
    }
    // persisted-curve round trip: an ivf layout carries its measured
    // curve, and a reopened session resolves knobs from the sidecar
    val path = java.nio.file.Files.createTempDirectory("graft_rtcurve").toString
    db.persistIndex("rt_ivf", path)
    db.close("rt_ivf")
    db.openIndexed("rt_ivf", path)
    val p1 = db.knobsFor("rt_ivf", 0.9) // measures + persists beside the model
    assert(graft.ann.ModelStore.loadRecallCurve(spark, path).isDefined)
    db.close("rt_ivf")
    db.openIndexed("rt_ivf", path)
    val p2 = db.knobsFor("rt_ivf", 0.9) // served from the sidecar
    assert(p1 === p2)
    // the partitioned IVF-PQ at-rest layout resolves recallTarget
    // through the same curve machinery when opened COLD (fresh facade,
    // models from the sidecar, no retraining) — and still meets the
    // measured target on the probe queries
    val pqPath = java.nio.file.Files.createTempDirectory("graft_rtivfpq").toString
    db.persistIndex("rt_ivfpq", pqPath)
    val db2 = new GraftDb(spark)
    db2.openIndexed("rt_ivfpq", pqPath)
    val point2 = db2.knobsFor("rt_ivfpq", 0.9)
    assert(point2.overlap >= 0.9,
      s"opened ivfpq curve ceiling ${point2.overlap} below target")
    val got2 = topIds(db2.searchMany("rt_ivfpq", qs, 10, knownNq = 4,
      recallTarget = 0.9))
    val ov2 = exact.toSeq.map { case (q, ex) =>
      ex.intersect(got2.getOrElse(q, Set.empty)).size.toDouble / ex.size }
    assert(ov2.sum / ov2.size >= 0.9,
      s"opened ivfpq recallTarget=0.9 delivered ${ov2.sum / ov2.size}")
    // the measured curve persisted beside the partitioned layout
    assert(graft.ann.ModelStore.loadRecallCurve(spark, pqPath).isDefined)
  }
}
