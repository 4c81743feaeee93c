package graft

import org.apache.spark.sql.functions.col

import graft.api.GraftDb

/** Executes the scaladoc examples on every public GraftDb method — the
  * reference's doctest discipline (test/doctest_test.exs): if a facade
  * example in the docs stops compiling or stops behaving as written,
  * this spec fails. Examples run verbatim (same calls, same literals)
  * against the same 4-dim corpus the docs describe. */
class DocExamplesSpec extends SparkSpec {

  test("facade scaladoc examples run as documented") {
    import spark.implicits._
    // --- createCollection
    val db = new GraftDb(spark)
    db.createCollection("articles", dimensions = 4)
    db.createCollection("codes", 4, metric = "l2", index = "sq8")
    // --- listCollections
    assert(db.listCollections() === Seq("articles", "codes"))
    // --- insert
    db.insert("articles", db.EmbeddingInput("a1", "hello world",
      vector = Array(1f, 0f, 0f, 0f)))
    // --- batch
    db.batch("articles", Seq(
      db.EmbeddingInput("a2", vector = Array(0f, 1f, 0f, 0f)),
      db.EmbeddingInput("a3", vector = Array(0f, 0f, 1f, 0f))))
    // --- all / getAll / count / config
    assert(db.all("articles").select("id", "vector").count() === 3)
    assert(db.getAll("articles").count() === 3)
    assert(db.count("articles") === 3L)
    assert(db.config("articles").metric.name === "cosine")
    // --- get / getByValue / getByVector
    assert(db.get("articles", "a1").map(_.getAs[String]("value"))
      === Some("hello world"))
    assert(db.getByValue("articles", "hello world").map(_.getAs[String]("id"))
      === Some("a1"))
    assert(db.getByVector("articles", Array(1f, 0f, 0f, 0f))
      .map(_.getAs[String]("id")) === Some("a1"))
    // --- search (plain + filtered)
    val q = Array(1f, 0f, 0f, 0f)
    val top = db.search("articles", q, limit = 2)
      .select("id", "score").collect()
    assert(top.head.getString(0) === "a1" && top.length === 2)
    assert(db.search("articles", q, 10, filter = Some(col("id") =!= "a2"))
      .select("id").collect().map(_.getString(0)).toSet === Set("a1", "a3"))
    // --- prepareQuery: unit-normalized under the cosine default
    assert(db.prepareQuery("articles", Array(3f, 0f, 0f, 0f)).toSeq
      === Seq(1f, 0f, 0f, 0f))
    // --- similaritySearch
    assert(db.similaritySearch("articles", Array(1f, 0f, 0f, 0f), 2)
      .head === ("a1", 1.0))
    // --- searchMany
    val queries = Seq(("q0", Seq(1f, 0f, 0f, 0f))).toDF("qid", "qvector")
    val many = db.searchMany("articles", queries, limit = 2, knownNq = 1L)
    assert(many.select("qid", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
      .contains(("q0", "a1")))
    // --- funnelSearch / quantizedSearch / quantizedSearchMany
    assert(db.funnelSearch("articles", q, 10, stages = Seq(1, 2, 4))
      .select("id").head.getString(0) === "a1")
    assert(db.quantizedSearch("articles", q, 10, candidates = 50)
      .select("id").head.getString(0) === "a1")
    assert(db.quantizedSearchMany("articles", queries, 10, knownNq = 1L)
      .select("id").collect().map(_.getString(0)).contains("a1"))
    // --- multiVectorSearch
    assert(db.multiVectorSearch("articles",
      Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f)), 5).count() === 3)
    // --- hybridSearch
    assert(db.hybridSearch("articles", q, 10,
      generators = Seq("funnel", "quantized"))
      .select("id").head.getString(0) === "a1")
    // --- textSearch / hybridRrfSearch
    assert(db.textSearch("articles", Seq("hello", "world"), 5)
      .select("id").head.getString(0) === "a1")
    assert(db.hybridRrfSearch("articles", Seq("hello"), q, 5)
      .select("id").head.getString(0) === "a1")
    // --- rerank
    assert(db.rerank("articles", q, alpha = 0.7, finalK = 3).count() === 3)
    // --- snapshot / loadSnapshot
    val snap = java.nio.file.Files.createTempDirectory("graft_doc_snap")
      .toString + "/articles_snap"
    db.snapshot("articles", snap)
    val restored = db.loadSnapshot(snap, overrides = Map("name" -> "articles2"))
    assert(restored === "articles2" && db.count(restored) === 3L)
    // --- index lifecycle on the sq8 collection
    val rows = (0 until 64).map(i => db.EmbeddingInput(f"c$i%03d",
      vector = Array(i.toFloat, (i % 5).toFloat, (i % 3).toFloat, 1f)))
    db.batch("codes", rows)
    val idxPath = java.nio.file.Files.createTempDirectory("graft_doc_idx")
      .toString + "/codes_idx"
    db.persistIndex("codes", idxPath)
    db.openIndexed("codes2", idxPath)
    val newRows = Seq(("c_new", "c_new", Seq(100f, 1f, 1f, 1f)))
      .toDF("id", "value", "vector")
    db.appendIndexed("codes2", newRows)
    db.compactIndexed("codes2")
    val qc = Array(10f, 0f, 1f, 1f)
    assert(db.search("codes2", qc, 10).count() === 10)
    assert(db.count("codes2") === 65L)
    // --- overlapCurve / knobsFor
    val curve = db.overlapCurve("codes", limit = 5)
    assert(curve.nonEmpty)
    val p = db.knobsFor("codes", recallTarget = 0.9, limit = 5)
    assert(db.searchMany("codes", Seq(("q0", qc.toSeq)).toDF("qid", "qvector"),
      5, candidates = p.candidates).count() === 5)
    // --- delete / close / deleteCollection
    db.delete("articles", "a3")
    assert(db.count("articles") === 2L)
    db.close("articles"); db.close("articles") // idempotent
    db.deleteCollection("codes")
    assert(!db.listCollections().contains("articles"))
  }

  test("Drift scaladoc examples run as documented") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Drift
    // --- psi
    val ref = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0).toDF("x")
    assert(Drift.psi(ref, ref, "x").agg(sum("psi_term")).head.getDouble(0) === 0.0)
    val cur = Seq(9.0, 9.5, 10.0).toDF("x")
    assert(Drift.psi(ref, cur, "x").agg(sum("psi_term")).head.getDouble(0) > 0.25)
    // --- psiCategorical
    val refLang = Seq("en", "en", "en", "de").toDF("lang")
    val curLang = Seq("en", "zz", "zz", "zz").toDF("lang")
    assert(Drift.psiCategorical(refLang, curLang, "lang")
      .filter(col("category") === "zz").head.getDouble(3) > 0.25)
    // --- psiByGroup
    val refG = Seq(("en", 1.0), ("en", 2.0), ("en", 3.0), ("de", 1.0),
      ("de", 2.0), ("de", 3.0)).toDF("lang", "x")
    val curG = Seq(("en", 1.0), ("en", 2.0), ("en", 3.0), ("de", 3.0),
      ("de", 3.0), ("de", 3.0)).toDF("lang", "x")
    val byLang = Drift.psiByGroup(refG, curG, "x", "lang").groupBy("lang")
      .agg(sum("psi_term").as("psi")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") === 0.0 && byLang("de") > 0.25)
    // --- standardizedMeanDiff
    val a = Seq(0.0, 2.0).toDF("x")
    val b = Seq(3.0, 5.0).toDF("x")
    assert(Drift.standardizedMeanDiff(a, b, "x").head.getDouble(3) === 3.0)
  }

  test("Sampling scaladoc examples run as documented") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Sampling
    val docs = (0 until 100).map(i => s"d$i").toDF("id")
    // --- hashBucket
    val mm = docs.select(Sampling.hashBucket(col("id"), 10).as("b"))
      .agg(min("b"), max("b")).head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 10)
    // --- sampleByHash
    val half = Sampling.sampleByHash(docs, "id", 0.5)
    assert(math.abs(half.count() - 50L) < 20)
    assert(half.collect().map(_.getString(0)).toSet ===
      Sampling.sampleByHash(docs, "id", 0.5).collect().map(_.getString(0)).toSet)
    // --- deterministicSplit
    val splitCounts = Sampling.deterministicSplit(docs, "id",
      Seq("train" -> 0.9, "test" -> 0.1)).groupBy("split").count()
    assert(splitCounts.agg(sum("count")).head.getLong(0) === 100L)
    // --- stratifiedSampleByHash
    val byLang = ((0 until 90).map(i => (s"d$i", "en")) ++
      (90 until 100).map(i => (s"d$i", "fr"))).toDF("id", "lang")
    val strat = Sampling.stratifiedSampleByHash(byLang, "id", "lang",
      Seq("en" -> 0.1, "fr" -> 1.0)).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strat("fr") === 10L && strat("en") < 30L)
    // --- clusterProportionalSample
    val emb = (0 until 40).map(i =>
      (s"d$i", Seq(if (i < 30) 1f else -1f, 0f))).toDF("id", "vector")
    val cents = Array(Array(1f, 0f), Array(-1f, 0f))
    val mix = Sampling.clusterProportionalSample(emb, "id", "vector", cents,
      fractions = Seq(0 -> 0.1, 1 -> 1.0)).groupBy("mix_cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(mix.getOrElse(1, 0L) === 10L && mix.getOrElse(0, 0L) < 10L)
    // --- temperatureSample
    val temp = Sampling.temperatureSample(byLang, "id", "lang",
      temperature = 2.0, targetFraction = 0.5).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(temp.getOrElse("fr", 0L) >= 8L, "T>1 boosts the tail group")
    // --- splitBalanceCheck
    val split = Sampling.deterministicSplit(docs, "id",
      Seq("train" -> 0.9, "test" -> 0.1))
    val zs = Sampling.splitBalanceCheck(split, "split",
      Seq("train" -> 0.9, "test" -> 0.1)).select("split", "z").collect()
    assert(zs.forall(r => math.abs(r.getDouble(1)) < 4.0))
    // --- kFold
    val folds = Sampling.kFold(docs, "id", k = 5).groupBy("fold").count()
    assert(folds.count() === 5L &&
      folds.agg(sum("count")).head.getLong(0) === 100L)
    // --- quantileBin
    val scored = (0 until 100).map(i => (s"d$i", i / 100.0)).toDF("id", "q")
    assert(Sampling.quantileBin(scored, col("q"), nBins = 10)
      .filter(col("bin") > 0).count() === 90L)
    // --- tokenBudgetMix
    val corpus = Seq(("d1", "web", 800L), ("d2", "web", 800L),
      ("d3", "code", 100L)).toDF("id", "source", "tokens")
    val plan = Sampling.tokenBudgetMix(corpus, "source", col("tokens"),
      Seq("web" -> 0.5, "code" -> 0.5), budgetTokens = 400L).collect()
      .map(r => r.getString(0) -> (r.getInt(3), r.getDouble(4))).toMap
    assert(plan("web")._1 === 125 && plan("code")._2 === 2.0)
    // --- applyTokenBudgetMix
    val webCorpus = (0 until 100).map(i => (s"d$i", "web", 10L))
      .toDF("id", "source", "tokens")
    val kept = Sampling.applyTokenBudgetMix(webCorpus, "id", "source",
      col("tokens"), Seq("web" -> 1.0), budgetTokens = 500L).count()
    assert(math.abs(kept - 50L) < 20)
    // --- weightedSample
    val weighted = (0 until 100).map(i =>
      (s"d$i", if (i < 5) 100.0 else 0.01)).toDF("id", "quality")
    val drawn = Sampling.weightedSample(weighted, "id", col("quality"), n = 5)
      .collect().map(_.getString(0))
    assert(drawn.length === 5 && drawn.count(_.stripPrefix("d").toInt < 5) >= 3)
    // --- weightedSamplePerGroup
    val scored2 = (0 until 40).map(i =>
      (s"d$i", if (i % 2 == 0) "en" else "fr", 1.0 + i))
      .toDF("id", "lang", "quality")
    val perG = Sampling.weightedSamplePerGroup(scored2, "id", "lang",
      col("quality"), nPerGroup = 3).groupBy("lang").count().collect()
    assert(perG.forall(_.getLong(1) === 3L))
    // --- leakageSafeSplit
    val four = Seq("a", "b", "c", "d").toDF("id")
    val dupPairs = Seq(("a", "b")).toDF("id_a", "id_b")
    val ls = Sampling.leakageSafeSplit(four, "id", dupPairs,
      Seq("train" -> 0.5, "test" -> 0.5))
    assert(ls.filter(col("id").isin("a", "b"))
      .select("split").distinct.count === 1L)
    // --- capPerGroup
    val byDomain = (0 until 30).map(i => (s"d$i", s"dom${i % 3}"))
      .toDF("id", "domain")
    assert(Sampling.capPerGroup(byDomain, "domain", cap = 2,
      Seq(col("id"))).count() === 6L)
    // --- packSequences
    val toPack = Seq(("a", 600L), ("b", 600L), ("c", 600L))
      .toDF("id", "tokens")
    val packed = Sampling.packSequences(toPack, col("id"), "tokens",
      binSize = 1024)
      .select("id", "pack_token_start", "pack_bin", "pack_end_bin")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(packed("a") === ((0L, 0L, 0L)))
    assert(packed("b") === ((600L, 0L, 1L)))
    assert(packed("c") === ((1200L, 1L, 1L)))
    // --- withSequentialIds
    val seqd = Sampling.withSequentialIds(Seq("c", "a", "b").toDF("id"),
      col("id")).orderBy("seq_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(seqd.toSeq === Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("EventStreams scaladoc examples run as documented") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStreams
    // the module's shared toy frame (ts = raw epoch nanos, Long)
    val events = Seq(
      ("u1", 0L, "view", 1.0, "e1"),
      ("u1", 5L * 1000000000L, "click", 2.0, "e2"),
      ("u1", 40L * 1000000000L, "purchase", 3.0, "e3"),
      ("u2", 10L * 1000000000L, "view", 4.0, "e4")
    ).toDF("user_id", "ts", "event_type", "value", "event_id")
    // --- epochMicros
    assert(events.select(EventStreams.epochMicros(events, "ts").as("us"))
      .agg(max("us")).head.getLong(0) === 40000000L)
    // --- windowedStats
    val win = EventStreams.windowedStats(events, windowSeconds = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(win === Map((0L, "view") -> 1L, (0L, "click") -> 1L,
      (10L, "view") -> 1L, (40L, "purchase") -> 1L))
    // --- slidingWindowStats: each event covers 2 hopping windows
    val slide = EventStreams.slidingWindowStats(events, windowSeconds = 20,
      slideSeconds = 10)
    assert(slide.agg(sum("cnt")).head.getLong(0) === 8L)
    // --- rollingStats
    val roll = EventStreams.rollingStats(events, k = 2)
      .filter(col("event_id") === "e2").head
    assert(roll.getAs[Long]("roll_n") === 2L &&
      roll.getAs[Double]("roll_avg") === 1.5)
    // --- topSessionPaths
    val paths = EventStreams.topSessionPaths(events, gapSeconds = 20,
      topK = 3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths === Map("view>click" -> 1L, "purchase" -> 1L, "view" -> 1L))
    // --- userActivityFeatures
    val feat = EventStreams.userActivityFeatures(events, bucketSeconds = 10)
      .filter(col("user_id") === "u1").head
    assert(feat.getAs[Long]("n_events") === 3L &&
      feat.getAs[Long]("active_buckets") === 2L &&
      feat.getAs[Double]("median_gap_us") === 20000000.0)
    // --- rollingZScore
    val z = EventStreams.rollingZScore(events, k = 2)
      .filter(col("event_id") === "e3").head
    assert(z.getAs[Long]("prior_n") === 2L && !z.isNullAt(z.fieldIndex("z")))
    // --- sessionWindowStats (native session_window needs a timestamp)
    val tsd = events.withColumn("tst", timestamp_micros(expr("ts div 1000")))
    assert(EventStreams.sessionWindowStats(tsd, gapSeconds = 20,
      tsCol = "tst").filter(col("user_id") === "u1").count() === 2L)
    // --- asofJoin / asofLookup
    val trades = Seq(("k1", 10L, "t1"), ("k1", 20L, "t2"))
      .toDF("key", "ts", "trade")
    val quotes = Seq(("k1", 5L, 1.5), ("k1", 15L, 1.6))
      .toDF("key", "ts", "px")
    val aj = EventStreams.asofJoin(trades, quotes, "key", "ts", Seq("px"))
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Double]("asof_px")).toMap
    assert(aj === Map("t1" -> 1.5, "t2" -> 1.6))
    val al = EventStreams.asofLookup(trades, quotes, "key", "ts", "px")
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Double]("asof_px")).toMap
    assert(al === aj)
    // --- intervalJoin / streamingIntervalJoin (batch frames)
    val clicks = Seq(("u1", 0L, "c1")).toDF("user_id", "ts", "click_id")
    val buys = Seq(("u1", 30L * 1000000000L, "b1"))
      .toDF("user_id", "ts", "buy_id")
    val ij = EventStreams.intervalJoin(clicks, buys, "user_id", "ts",
      lowerNs = 0L, upperNs = 60L * 1000000000L).collect()
    assert(ij.length === 1 && ij.head.getAs[Long]("delta_ns") === 30000000000L)
    val clicksT = clicks.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val buysT = buys.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val sij = EventStreams.streamingIntervalJoin(clicksT, buysT, "user_id",
      "ts", 0L, 60L * 1000000000L).collect()
    assert(sij.length === 1 && sij.head.getAs[Long]("delta_ns") === 30000000000L)
    // --- sessionize
    val sess = EventStreams.sessionize(events, gapSeconds = 20)
      .groupBy("user_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sess === Map("u1" -> 2L, "u2" -> 1L))
    // --- funnelSteps / funnelTrend / funnelSummary
    val perUser = EventStreams.funnelSteps(events,
      Seq("view", "click", "purchase"), horizonSeconds = 3600)
    val depths = perUser.select("user_id", "depth").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(depths === Map("u1" -> 3, "u2" -> 1))
    assert(EventStreams.funnelTrend(perUser, bucketSeconds = 10).count() === 2L)
    val summ = EventStreams.funnelSummary(perUser,
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(summ === Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
    // --- retentionCohorts / retentionCohortsApprox
    val ret = EventStreams.retentionCohorts(events, bucketSeconds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ret === Map((0L, 0L) -> 1L, (0L, 4L) -> 1L, (1L, 0L) -> 1L))
    assert(EventStreams.retentionCohortsApprox(events, bucketSeconds = 10)
      .count() === 3L)
    // --- streamingWindowedStats + runAvailableNow
    val dir = java.nio.file.Files.createTempDirectory("graft_doc_events").toString
    val tsw = events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    tsw.write.mode("overwrite").parquet(dir)
    val agg = EventStreams.streamingWindowedStats(spark, dir, tsw.schema,
      windowLength = "10 seconds")
    EventStreams.runAvailableNow(agg, "doc_win")
    assert(spark.table("doc_win").count() === 4L)
    // --- streamingSlidingWindowStats on a batch frame
    assert(EventStreams.streamingSlidingWindowStats(tsw, "20 seconds",
      "10 seconds").agg(sum("cnt")).head.getLong(0) === 8L)
    // --- statefulSessionize on a batch Dataset
    val ds = Seq(EventStreams.SessionEvent(1L, 0L, 1.0),
      EventStreams.SessionEvent(1L, 50L * 1000000000L, 2.0)).toDS
    val closed = EventStreams.statefulSessionize(ds, gapSeconds = 20,
      idleFlush = false).collect()
    assert(closed.length === 1 && closed.head.n_events === 1)
    // --- statefulRollingStats
    val rolls = Seq(EventStreams.RollEvent(1L, 1L, 1L, 2.0),
      EventStreams.RollEvent(1L, 2L, 2L, 4.0)).toDS
    val rout = EventStreams.statefulRollingStats(rolls, k = 2).collect()
    assert(rout.find(_.event_id == 2L).get.roll_avg === 3.0)
    // --- statefulFunnel
    val fes = Seq(EventStreams.FunnelEvent(1L, 0L, 0),
      EventStreams.FunnelEvent(1L, 1000L, 1)).toDS
    assert(EventStreams.statefulFunnel(fes, numSteps = 2,
      horizonSeconds = 3600).collect().length === 1)
    // --- statefulAsofJoin
    val asof = Seq(
      EventStreams.AsofStreamEvent(1L, 0L, 0, 1.5, ""),
      EventStreams.AsofStreamEvent(1L, 10L, 1, 0.0, "q1")).toDS
    val aout = EventStreams.statefulAsofJoin(asof).collect()
    assert(aout.length === 1 && aout.head.asof_value === Some(1.5))
  }

  test("Dedup scaladoc examples run as documented") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    import graft.ann.CosineLsh
    // the module's shared toy frames
    val docs = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "the quick brown fox jumps over the lazy dog"),
      ("d3", "a quick brown fox jumps over a lazy dog today"),
      ("d4", "completely different text about spark pipelines")
    ).toDF("id", "text")
    val vecs = Seq(
      ("v1", Seq(1f, 0f, 0f)), ("v2", Seq(0.999f, 0.045f, 0f)),
      ("v3", Seq(0f, 1f, 0f))
    ).toDF("id", "vector")
    // --- exactDuplicates / dropExactDuplicates
    val dups = Dedup.exactDuplicates(docs, "id", col("text"))
      .filter(col("is_dup")).collect()
    assert(dups.length === 1 && dups.head.getAs[String]("id") === "d2" &&
      dups.head.getAs[String]("canonical_id") === "d1")
    assert(Dedup.dropExactDuplicates(docs, "id", col("text")).count() === 3L)
    // --- exactJaccardPairs
    val exact1 = Dedup.exactJaccardPairs(docs, "id", col("text"), k = 3)
      .filter(col("jaccard") === 1.0).collect()
    assert(exact1.map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("d1", "d2")))
    // --- minhashCandidatePairs / minhashHotBands / minhashVerifiedPairs
    val cands = Dedup.minhashCandidatePairs(docs, "id", col("text"),
      k = 3, numHashes = 8, bands = 4).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cands.contains(("d1", "d2")))
    assert(Dedup.minhashHotBands(docs, "id", col("text"), 3, 8, 4).count() === 0L)
    val pairs = Dedup.minhashVerifiedPairs(docs, "id", col("text"),
      k = 3, numHashes = 8, bands = 4, threshold = 0.7)
    assert(pairs.select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("d1", "d2")))
    // --- clusters
    val chain = Seq(("d1", "d2"), ("d2", "d3")).toDF("id_a", "id_b")
    assert(Dedup.clusters(docs, "id", chain)
      .filter(col("cluster_id") === "d1").count() === 3L)
    // --- dropNearDuplicates
    val kept = Dedup.dropNearDuplicates(docs, "id", col("text"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(!kept.contains("d2") && kept.contains("d1") && kept.contains("d4"))
    // --- tuneBands
    val (tb, tr, tt) = Dedup.tuneBands(numHashes = 16, targetThreshold = 0.5)
    assert(tb * tr === 16 && tt > 0.2 && tt < 0.8)
    // --- clusterSizeHistogram
    val hist = Dedup.clusterSizeHistogram(
      Dedup.clusters(docs, "id", Seq(("d1", "d2")).toDF("id_a", "id_b")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(hist(1L) === ((2L, 2L, 0L)) && hist(2L) === ((1L, 2L, 1L)))
    // --- sourceOverlap
    val sourced = docs.withColumn("source",
      when(col("id") < "d3", "crawl_a").otherwise("crawl_b"))
    val ov = Dedup.sourceOverlap(sourced, "source", col("text"), k = 3).collect()
    assert(ov.length === 1 && ov.head.getString(0) === "crawl_a" &&
      ov.head.getLong(2) > 0)
    // --- keepBestPerCluster
    val scored = docs.withColumn("quality", length(col("text")))
    val best = Dedup.keepBestPerCluster(scored, "id",
      Seq(("d1", "d3")).toDF("id_a", "id_b"), col("quality"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(best.contains("d3") && !best.contains("d1"))
    // --- against family (exact)
    val batch = Seq(
      ("b1", "the quick brown fox jumps over the lazy dog"),
      ("b2", "a genuinely novel document")).toDF("id", "text")
    assert(Dedup.exactMatchesAgainst(docs, batch, col("text"))
      .select("id").collect().map(_.getString(0)).toSeq === Seq("b1"))
    assert(Dedup.dropExactAgainst(docs, batch, col("text"))
      .select("id").collect().map(_.getString(0)).toSeq === Seq("b2"))
    assert(Dedup.dropExactAgainstBloom(docs, batch, col("text"))
      .select("id").collect().map(_.getString(0)).toSeq === Seq("b2"))
    val bloom = Dedup.corpusKeyBloom(docs, col("text"))
    assert(bloom.expectedFpp() < 0.1)
    // --- against family (minhash)
    val mAg = Dedup.minhashMatchesAgainst(docs, batch, "id", col("text"),
      k = 3, numHashes = 8, bands = 4, threshold = 0.7).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(mAg === Set(("b1", "d1"), ("b1", "d2")))
    assert(Dedup.dropNearAgainst(docs, batch, "id", col("text"))
      .select("id").collect().map(_.getString(0)).toSeq === Seq("b2"))
    assert(Dedup.minhashAgainstHotBands(docs, batch, "id", col("text"),
      3, 8, 4).count() === 0L)
    // --- hamming64Pairs
    val hashes = Seq(("h1", 0xF0F0L), ("h2", 0xF0F1L), ("h3", 0x0F0FL))
      .toDF("id", "h")
    val hp = Dedup.hamming64Pairs(hashes, "id", col("h"), maxHamming = 3)
      .collect()
    assert(hp.length === 1 && hp.head.getString(0) === "h1" &&
      hp.head.getInt(2) === 1)
    // --- simhash family
    val sp = Dedup.simhashPairs(docs, "id", col("text"), maxHamming = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getInt(2))).toMap
    assert(sp.get(("d1", "d2")) === Some(0))
    assert(Dedup.simhashHotBands(docs, "id", col("text")).count() === 0L)
    val sAg = Dedup.simhashMatchesAgainst(docs, batch, "id", col("text"),
      maxHamming = 3).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sAg.contains(("b1", "d1")) && sAg.contains(("b1", "d2")))
    val sDrop = Dedup.dropSimhashAgainst(docs, batch, "id", col("text"),
      maxHamming = 3).select("id").collect().map(_.getString(0))
    assert(!sDrop.contains("b1") && sDrop.contains("b2"))
    assert(Dedup.simhashAgainstHotBands(docs, batch, "id", col("text"))
      .count() === 0L)
    // --- embedding family
    val lsh = CosineLsh.LshConfig(bands = 8, bitsPerBand = 4)
    val ep = Dedup.embeddingPairs(vecs, "id", "vector", lsh, threshold = 0.9)
      .collect()
    assert(ep.length === 1 && ep.head.getString(0) === "v1" &&
      ep.head.getString(1) === "v2" && ep.head.getDouble(2) > 0.99)
    val vbatch = Seq(("n1", Seq(0.998f, 0.05f, 0f)),
      ("n2", Seq(0f, 0f, 1f))).toDF("id", "vector")
    val em = Dedup.embeddingMatchesAgainst(vecs, vbatch, "id", "vector",
      lsh, threshold = 0.9).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(em === Set(("n1", "v1"), ("n1", "v2")))
    val nc = Dedup.normalizedCorpus(vecs, "id", "vector").persist()
    assert(Dedup.dropEmbeddingAgainst(nc, vbatch, "id", "vector", lsh, 0.9,
      corpusIsNormalized = true)
      .select("id").collect().map(_.getString(0)).toSeq === Seq("n2"))
    assert(Dedup.dropEmbeddingAgainst(vecs, vbatch, "id", "vector", lsh, 0.9)
      .select("id").collect().map(_.getString(0)).toSeq === Seq("n2"))
    nc.unpersist()
    assert(Dedup.embeddingHotBands(vecs, "id", "vector", lsh).count() === 0L)
    // --- span dedup
    val pages = Seq(
      ("p1", "copyright footer text plus unique alpha content"),
      ("p2", "copyright footer text plus unique beta content"))
      .toDF("id", "text")
    val spans = Dedup.dropSharedSpans(pages, "id", col("text"),
      spanTokens = 3, minDocs = 2).collect()
    assert(spans.forall(r => r.getAs[Int]("n_tokens_after") <
      r.getAs[Int]("n_tokens_before")))
    assert(spans.find(_.getString(0) == "p1").get
      .getAs[String]("clean_text").contains("alpha"))
    val rep = Dedup.dropRepeatedSpans(
      Seq(("p1", "buy now buy now buy now unique ending")).toDF("id", "text"),
      "id", col("text"), spanTokens = 2).head
    assert(rep.getAs[Int]("n_tokens_after") < rep.getAs[Int]("n_tokens_before"))
    // --- semantic dedup
    val cents = Array(Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    val semP = Dedup.semanticPairs(vecs, "id", "vector", cents,
      threshold = 0.9).collect()
    assert(semP.length === 1 && semP.head.getString(0) === "v1")
    assert(Dedup.dropSemanticDuplicates(vecs, "id", "vector", cents, 0.9)
      .select("id").collect().map(_.getString(0)).toSet === Set("v1", "v3"))
    assert(Dedup.semanticHotCells(vecs, "id", "vector", cents).count() === 0L)
    // --- exactCosinePairs
    val ec = Dedup.exactCosinePairs(vecs, "id", "vector")
      .filter(col("cosine") > 0.9).collect()
    assert(ec.length === 1 && ec.head.getString(0) === "v1")
    // --- dropDuplicateLinesAcross
    locally { // scoped: the enclosing test already binds a `pages`
      val pages = Seq(
        ("p1", "home | about\nunique article one"),
        ("p2", "home | about\nunique article two")
      ).toDF("id", "text")
      val lineDeduped = Dedup.dropDuplicateLinesAcross(pages, "id", "text")
        .select("id", "text_deduped").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(lineDeduped("p1") === "home | about\nunique article one")
      assert(lineDeduped("p2") === "unique article two")
    }
    // --- streaming forms (memory-stream harness from the scaladoc)
    locally {
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val input = MemoryStream[(java.sql.Timestamp, String)]
      val deduped = Dedup.streamingExactDedup(
        input.toDF().toDF("ts", "text"), col("text"), "ts", "10 minutes")
      val q = deduped.writeStream.format("memory").queryName("doc_sdedup")
        .outputMode("append").start()
      try {
        val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        input.addData((t0, "hello"), (t0, "hello"), (t0, "world"))
        q.processAllAvailable()
        assert(spark.table("doc_sdedup").count() === 2L)
      } finally q.stop()
      val mIn = MemoryStream[(java.sql.Timestamp, String, String)]
      val novelty = Dedup.streamingMinhashNovelty(
        mIn.toDF().toDF("ts", "id", "text"), "id", col("text"),
        "ts", watermark = "5 minutes", k = 2, numHashes = 8, bands = 4)
      val q2 = novelty.writeStream.format("memory").queryName("doc_novel")
        .outputMode("append").start()
      try {
        val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        mIn.addData((t0, "a", "the quick brown fox jumps over the dog"))
        q2.processAllAvailable()
        mIn.addData((java.sql.Timestamp.valueOf("2024-01-01 10:30:00"),
          "z", "late sentinel"))
        q2.processAllAvailable()
        assert(spark.table("doc_novel").filter(col("id") === "a")
          .head.getBoolean(2) === true)
      } finally q2.stop()
      val eIn = MemoryStream[(java.sql.Timestamp, String, Seq[Float])]
      val eNovelty = Dedup.streamingEmbeddingNovelty(
        eIn.toDF().toDF("ts", "id", "vector"), "id", "vector",
        "ts", watermark = "5 minutes")
      val q3 = eNovelty.writeStream.format("memory").queryName("doc_enovel")
        .outputMode("append").start()
      try {
        val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        eIn.addData((t0, "a", Seq(1f, 0f, 0f)))
        q3.processAllAvailable()
        eIn.addData((java.sql.Timestamp.valueOf("2024-01-01 10:30:00"),
          "z", Seq(0f, 1f, 0f)))
        q3.processAllAvailable()
        assert(spark.table("doc_enovel").filter(col("id") === "a")
          .head.getBoolean(2) === true)
      } finally q3.stop()
    }
  }
}
