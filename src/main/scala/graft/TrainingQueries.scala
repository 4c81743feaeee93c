package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ann.{AnisotropicPq, CosineLsh, IvfIndex, KnnGraph, ModelStore, Opq, Pq, Sq8}
import graft.core.{Metric, Normalize}
import graft.dedup.Dedup
import graft.encode.Pca
import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import graft.search.Search
import graft.text.{Bm25, Bpe, NaiveBayes, NgramLm, TextAnalysis, WebText}

/** Training-data pipeline queries (dedup / text / multimodal / events /
  * relational) with DuckDB oracles, merged into SparkEntry. */
object TrainingQueries {

  private def roundCols(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), scale) + lit(0.0)))

  /** Events table: ns timestamps are only readable as raw Long nanos. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  /** Deterministic synthetic HTML page per documents row (mirrored
    * verbatim in the DuckDB oracle). */
  private def synthHtml: Column = concat(
    lit("<html><head><title>"), col("source"),
    lit("</title><script type=\"text/javascript\">var v = "),
    col("doc_id").cast("string"),
    lit(";</script><style>p { color: red }</style></head><body><h1>"),
    col("source"), lit("</h1><p>"), col("text"),
    lit(" &amp; more &lt;tags&gt;</p><a href=\"/d/"),
    col("doc_id").cast("string"), lit("\">read "), col("lang"),
    lit(" doc</a><div><a href=\"/next\">next</a></div></body></html>"))

  /** Deterministic synthetic URL per documents row: userinfo, www/blog
    * subdomains, multi-label suffixes, ports, query strings all cycle
    * by doc_id (mirrored verbatim in the DuckDB oracle). */
  private def synthUrl: Column = {
    val did = col("doc_id")
    when(did % 11 === 0,
      // bracketed IPv6 authority with a port: the naive first-colon
      // split would truncate the host to '[' (the r12 advice finding)
      concat(lit("https://[2001:db8::"), (did % 9).cast("string"),
        lit("]:8080/v6/"), did.cast("string")))
    .otherwise(concat(lit("https://"),
      when(did % 7 === 0, lit("user:pw@")).otherwise(lit("")),
      when(did % 5 === 0, lit("www."))
        .when(did % 5 === 1, lit("blog.")).otherwise(lit("")),
      col("source"),
      when(did % 4 === 0, lit(".co.uk")).when(did % 4 === 1, lit(".com"))
        .when(did % 4 === 2, lit(".org")).otherwise(lit(".com.au")),
      when(did % 3 === 0, lit(":8080")).otherwise(lit("")),
      when(did % 2 === 0,
        concat(lit("/p/"), did.cast("string"), lit("?q="), col("lang")))
        .otherwise(lit(""))))
  }

  /** Noisy synthetic URL per documents row for the canonicalize oracle:
    * WWW/case, trailing slashes, tracking params, param order, and
    * fragments all cycle by doc_id so several raw forms share one
    * canonical key (mirrored verbatim in the DuckDB oracle). */
  private def synthNoisyUrl: Column = {
    val did = col("doc_id")
    concat(lit("https://"),
      when(did % 3 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".com"),
      when(did % 4 === 0, lit("/a/b/")).when(did % 4 === 1, lit("/a/b"))
        .when(did % 4 === 2, lit("/")).otherwise(lit("")),
      when(did % 5 === 0, lit("?utm_source=x&b=2&a=1"))
        .when(did % 5 === 1, lit("?a=1&b=2"))
        .when(did % 5 === 2, lit("?utm_campaign=y"))
        // a BARE tracking param (no '='): still transport noise
        .when(did % 5 === 3, lit("?gclid&a=1")).otherwise(lit("")),
      when(did % 2 === 0, lit("#frag")).otherwise(lit("")))
  }

  /** Dedup corpus: originals + exact copies + near copies, derived from
    * the documents table (deterministic, mirrored in SQL). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.read(s, dir, "documents")
    docs.filter(col("doc_id") < 50).select(col("doc_id").as("id"), col("text"))
      .union(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("id"), col("text")))
      .union(docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
        .select((col("doc_id") + 20000).as("id"),
          concat(col("text"), lit(" zzextra")).as("text")))
  }

  private val corpusSql =
    """SELECT doc_id AS id, text FROM documents WHERE doc_id < 50
      UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20
      UNION ALL SELECT doc_id + 20000, text || ' zzextra' FROM documents WHERE doc_id >= 20 AND doc_id < 40"""

  /** Batch-vs-corpus dedup fixtures: the at-rest corpus is the original
    * docs; the "new crawl" batch holds exact copies (doc_id<20), near
    * copies (20-39, ' zzextra' suffix), and genuinely new docs (50-69). */
  private def dedupCorpusSide(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id").as("id"), col("text"))

  private def dedupBatchSide(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.read(s, dir, "documents")
    docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 10000).as("id"), col("text"))
      .union(docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
        .select((col("doc_id") + 20000).as("id"),
          concat(col("text"), lit(" zzextra")).as("text")))
      .union(docs.filter(col("doc_id") >= 50 && col("doc_id") < 70)
        .select((col("doc_id") + 30000).as("id"), col("text")))
  }

  private val dedupCorpusSideSql =
    "SELECT doc_id AS id, text FROM documents WHERE doc_id < 50"

  private val dedupBatchSideSql =
    """SELECT doc_id + 10000 AS id, text FROM documents WHERE doc_id < 20
      UNION ALL SELECT doc_id + 20000, text || ' zzextra' FROM documents WHERE doc_id >= 20 AND doc_id < 40
      UNION ALL SELECT doc_id + 30000, text FROM documents WHERE doc_id >= 50 AND doc_id < 70"""

  /** Decimal-exact money sum: the source values are true 2-decimal
    * amounts stored as doubles, so the decimal cast is unambiguous in
    * both engines; the sum is then exact and order-independent. */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** price * (1 - discount) with BOTH factors cast to exact decimals
    * first: a double product would land on .xx5 halfway points that
    * Spark and DuckDB round differently. */
  private def discountedSum(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1.0) - discount).cast(DecimalType(18, 2))).cast("double")

  /** Train-once / load-thereafter for the quantized ANN gate rows: the
    * first invocation per (sf-dir, name) trains the model, persists the
    * ENCODED at-rest layout plus its `_graft_model.json` sidecar, and
    * every later invocation loads both — the lifecycle a real
    * deployment runs (train/encode amortized over ingest, queries pay
    * only probe + ADC + rerank). Bump the version tag whenever an
    * encoding changes so stale caches never survive a semantics change. */
  private val ModelCacheVersion = "v1"
  /** Train-once/load-thereafter cache for gate ANN layouts. The key is
    * (ModelCacheVersion, sf-dir basename, name) ONLY — it does not see
    * the training config inside `build`, so changing a row's training
    * parameters or regenerating the sf fixtures REQUIRES bumping
    * ModelCacheVersion (or rm -rf /tmp/graft_ann_cache); a stale hit
    * would otherwise gate against the old layout. */
  private def cachedLayout(s: SparkSession, dir: String, name: String)(
      build: String => Unit): String = {
    val base = s"/tmp/graft_ann_cache/${ModelCacheVersion}_" +
      s"${new java.io.File(dir).getName}_$name"
    if (!ModelStore.exists(s, base + "/" + ModelStore.SidecarName)) build(base)
    base
  }
  private def sidecar(base: String): String = base + "/" + ModelStore.SidecarName

  /** Gate RaBitQ config: uncentered (zero centroid — the oracle's mean
    * would otherwise depend on row-visit order), ordered rotation,
    * 1 round, seed 7 (the OPQ gate's sign stream). */
  private def rabitqConfig(d: Int) = graft.ann.RaBitQ.Config(dims = d, seed = 7L)
  private def rabitqModel(s: SparkSession, dir: String, d: Int) =
    graft.ann.RaBitQ.Model(rabitqConfig(d), new Array[Double](d))

  /** Driver-shim HNSW graph per sf-dir: the gate data is immutable, so
    * repeat invocations in one process (bench warmup+median) measure
    * the search, not a rebuild. */
  private val hnswShimCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.index.Hnsw]

  // =========================================================== queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- text analysis
    "text_stats" -> ((s, dir) => {
      val t = col("text")
      roundCols(Tables.read(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.wordCount(t).as("n_tokens"),
        TextAnalysis.regexTokenCount(t).cast("int").as("n_regex_tokens"),
        TextAnalysis.punctCount(t).cast("int").as("n_punct"),
        TextAnalysis.stopwordRatio(t).as("stop_ratio"),
        TextAnalysis.qualityScore(t).as("quality")),
        Seq("stop_ratio", "quality"))
    }),

    "text_langid" -> ((s, dir) =>
      Tables.read(s, dir, "documents").select(
        col("doc_id"), TextAnalysis.langId(col("text")).as("lang_detected"))),

    // Gopher/MassiveWeb repetition + format filters, exact count ratios
    "text_gopher_quality" -> ((s, dir) => {
      val t = col("text")
      roundCols(Tables.read(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.wordCount(t).as("n_words"),
        TextAnalysis.meanWordLen(t).as("mean_word_len"),
        TextAnalysis.fracAlphaWords(t).as("frac_alpha"),
        TextAnalysis.fracSymbolWords(t).as("frac_symbol"),
        TextAnalysis.fracBulletLines(t).as("frac_bullet"),
        TextAnalysis.fracEllipsisLines(t).as("frac_ellipsis"),
        TextAnalysis.fracDuplicateLines(t).as("frac_dup_lines"),
        TextAnalysis.topTokenFrac(t).as("top_token_frac"),
        TextAnalysis.topNgramFrac(t, 2).as("top_2gram_frac"),
        TextAnalysis.gopherKeep(t, minWords = 20).cast("int").as("keep")),
        Seq("mean_word_len", "frac_alpha", "frac_symbol", "frac_bullet",
          "frac_ellipsis", "frac_dup_lines", "top_token_frac", "top_2gram_frac"))
    }),

    // END-TO-END curation pipeline — the full training-data story as ONE
    // oracle-checked query: Gopher quality gate -> exact dedup (keep the
    // canonical doc per md5(text)) -> benchmark decontamination (only
    // docs sharing ZERO 5-gram shingles with the eval set survive,
    // which also drops the eval docs themselves) -> stratified
    // per-language downsampling -> contiguous sequential ids. Every
    // stage is an already-gated operator; composing them in one query
    // pins that the stages agree end to end (all-integer output, no
    // float tolerance).
    "pipeline_curation" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val kept = docs.filter(TextAnalysis.gopherKeep(col("text"), minWords = 20))
      // stage materialization: each downstream stage re-reads canonical
      // rows instead of re-running tokenization + quality metrics
      // through the whole lineage (a real pipeline checkpoints between
      // stages for exactly this reason)
      val canon = Dedup.dropExactDuplicates(kept, "doc_id", col("text"))
        .localCheckpoint()
      val bench = docs.filter(col("doc_id") >= 480 || col("doc_id") < 10)
        .select(col("text"))
      val contam = TextAnalysis.contaminationReport(
        canon.select(col("doc_id"), col("text")), bench, "doc_id", "text", n = 5)
      // materialized like the report variant: withSequentialIds' range
      // sampling + shuffle map would otherwise each re-run the whole
      // contamination join (the most expensive stage) once more
      val clean = canon.join(
        contam.filter(col("n_shared") === 0).select(col("id").as("doc_id")),
        "doc_id").localCheckpoint()
      val sampled = graft.functions.Sampling.stratifiedSampleByHash(
        clean.select(col("doc_id"), col("lang")), "doc_id", "lang",
        Seq("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.1, salt = "graft")
      graft.functions.Sampling.withSequentialIds(sampled, col("doc_id"))
    }),

    // the same pipeline reported as a per-stage funnel: the oracle
    // re-derives every stage's surviving count from the same CTE chain
    "pipeline_curation_report" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val kept = docs.filter(TextAnalysis.gopherKeep(col("text"), minWords = 20))
      val canon = Dedup.dropExactDuplicates(kept, "doc_id", col("text"))
        .localCheckpoint()
      val bench = docs.filter(col("doc_id") >= 480 || col("doc_id") < 10)
        .select(col("text"))
      val contam = TextAnalysis.contaminationReport(
        canon.select(col("doc_id"), col("text")), bench, "doc_id", "text", n = 5)
      // clean feeds TWO stageReport rows (its own count + sampled's) —
      // without materialization the contamination join runs twice
      val clean = canon.join(
        contam.filter(col("n_shared") === 0).select(col("id").as("doc_id")),
        "doc_id").localCheckpoint()
      val sampled = graft.functions.Sampling.stratifiedSampleByHash(
        clean.select(col("doc_id"), col("lang")), "doc_id", "lang",
        Seq("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.1, salt = "graft")
      graft.functions.Curation.stageReport(Seq(
        "input" -> docs, "quality_gate" -> kept, "exact_dedup" -> canon,
        "decontaminate" -> clean, "stratified_mix" -> sampled))
    }),

    // the same pipeline with the flagship stage added: MinHash+LSH
    // near-dup removal between exact dedup and decontamination. The
    // input is augmented with PLANTED near-duplicates (docs 0-29
    // re-appended with one extra token at id+10000) so the stage
    // genuinely bites: planted copies pass the quality gate and exact
    // dedup (texts differ), then fall to the cluster-canonical rule
    // (min id wins — the original survives).
    "pipeline_curation_neardup" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val aug = docs.select(col("doc_id"), col("lang"), col("text"))
        .union(docs.filter(col("doc_id") < 30).select(
          (col("doc_id") + 10000).as("doc_id"), col("lang"),
          concat(col("text"), lit(" zzextra")).as("text")))
      val kept = aug.filter(TextAnalysis.gopherKeep(col("text"), minWords = 20))
      // stage materialization (see pipeline_curation): without it the
      // tokenization + metrics recompute once per downstream branch —
      // the near-dup stage alone reads canon from three join sides
      val canon = Dedup.dropExactDuplicates(kept, "doc_id", col("text"))
        .localCheckpoint()
      val nd = Dedup.dropNearDuplicates(canon, "doc_id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .localCheckpoint()
      val bench = docs.filter(col("doc_id") >= 480 || col("doc_id") < 10)
        .select(col("text"))
      val contam = TextAnalysis.contaminationReport(
        nd.select(col("doc_id"), col("text")), bench, "doc_id", "text", n = 5)
      // materialized for the same reason as pipeline_curation's clean
      val clean = nd.join(
        contam.filter(col("n_shared") === 0).select(col("id").as("doc_id")),
        "doc_id").localCheckpoint()
      val sampled = graft.functions.Sampling.stratifiedSampleByHash(
        clean.select(col("doc_id"), col("lang")), "doc_id", "lang",
        Seq("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.1, salt = "graft")
      graft.functions.Sampling.withSequentialIds(sampled, col("doc_id"))
    }),

    // the same pipeline with the SEMANTIC stage instead of MinHash:
    // SemDeDup over the embedding column between exact dedup and the
    // sequential ids, cells = the corpus's trained k-means model passed
    // IN via semanticCentroids (train once per corpus generation — the
    // same model the dedup_semantic_* rows replicate in SQL). Planted
    // PARAPHRASES: docs 0-29 re-added at id+10000 with reworded text
    // (different exact key, near-dup stage off) and the embedding
    // perturbed by +0.25 on dim 0 (cosine ~0.97 against a ~0.5
    // background) — only the semantic stage can drop them; the min-id
    // original survives.
    "pipeline_curation_semantic" -> ((s, dir) => {
      val (_, centroids) = semanticFixture(s, dir)
      val docs = Tables.read(s, dir, "documents")
      val emb = Tables.read(s, dir, "embeddings")
      val base = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(col("doc_id"), col("lang"), col("text"), col("embedding"))
      val aug = base.union(base.filter(col("doc_id") < 30).select(
        (col("doc_id") + 10000).as("doc_id"), col("lang"),
        concat(col("text"), lit(" reworded paraphrase marker")).as("text"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x.cast("double") + lit(0.25)).cast("float"))
            .otherwise(x)).as("embedding")))
      graft.functions.Curation.curate(aug, "doc_id", "text",
        config = graft.functions.Curation.Config(nearDedup = false,
          semanticDedup = true, semanticThreshold = 0.9,
          semanticCentroids = Some(centroids)))
        .select(col("doc_id"), col("lang"), col("seq_id"))
    }),

    // deterministic hash-based train/val/test split + fractional sample
    // (md5-derived buckets: stable across runs, engines, cluster sizes)
    "data_split" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").select(col("doc_id"))
      graft.functions.Sampling.deterministicSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "graft")
        .withColumn("bucket",
          graft.functions.Sampling.hashBucket(col("doc_id"), 1000, "graft"))
        .withColumn("in_sample", (col("bucket") < 250).cast("int"))
    }),

    // SRM guard: the 80/10/10 split's observed counts vs expectation,
    // with the normal-approximation z per split
    "data_split_balance" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").select(col("doc_id"))
      val split = graft.functions.Sampling.deterministicSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "graft")
      roundCols(graft.functions.Sampling.splitBalanceCheck(split, "split",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
        Seq("expected_frac", "actual_frac", "z"))
    }),

    // dimension histogram: a mixed-dims corpus surfaces as >1 row
    "emb_dim_histogram" -> ((s, dir) =>
      graft.prepare.Prepare.dimensionHistogram(
        Tables.read(s, dir, "embeddings"), "embedding")),

    // deterministic k-fold CV assignment (md5 bucket mod k)
    "data_kfold" -> ((s, dir) =>
      graft.functions.Sampling.kFold(
        Tables.read(s, dir, "documents").select(col("doc_id")),
        "doc_id", k = 5, salt = "graft")),

    // weighted sampling without replacement (Efraimidis–Spirakis):
    // md5-derived exact-dyadic uniforms -> ln(u)/w priorities -> one
    // TakeOrderedAndProject; the oracle re-derives every priority bit
    // for bit and takes the same top-n
    "data_weighted_sample" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      roundCols(graft.functions.Sampling.weightedSample(
        docs, "doc_id", col("n_chars"), n = 120, salt = "graft"),
        Seq("priority"))
    }),

    // per-group weighted sampling: 15 docs per language, weighted by
    // n_chars — E-S priorities + one WindowGroupLimit-pre-cut window
    "data_weighted_sample_per_lang" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      roundCols(graft.functions.Sampling.weightedSamplePerGroup(
        docs, "doc_id", "lang", col("n_chars"), nPerGroup = 15,
        salt = "graft"), Seq("priority"))
    }),

    // DSIR importance weights (Xie et al. 2023): each doc's hashed-
    // n-gram (uni+bi) log-likelihood ratio under target-vs-raw unigram
    // models; target = the corpus's own English slice. Fit = two
    // bucket-bounded count jobs; scoring = one pure projection against
    // the table re-entering the plan as a single array literal
    "data_dsir_weights" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      roundCols(graft.text.Dsir.importanceWeights(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), "text", buckets = 512)
        .select("doc_id", "dsir_logw"), Seq("dsir_logw"))
    }),

    // DSIR resample: deterministic Gumbel-top-n on the importance log
    // weights — a without-replacement draw with inclusion proportional
    // to exp(logw), the paper's selection step, md5-seeded so the
    // oracle re-derives every key bit for bit
    "data_dsir_resample" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val w = graft.text.Dsir.importanceWeights(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), "text", buckets = 512)
      roundCols(graft.text.Dsir.resampleTop(w, "doc_id",
        col("dsir_logw"), n = 100, salt = "graft")
        .select("doc_id", "gumbel_key"), Seq("gumbel_key"))
    }),

    // DSIR-curated pipeline (the paper's end-to-end use): Gopher quality
    // gate -> DSIR fit with FIT/SCORE SEPARATION (the two count jobs see
    // only a deterministic md5 half-sample of the gated corpus — at
    // 100 TB the fit never reads every row — while the scoring
    // projection covers ALL gated rows; target = the gated English
    // slice) -> Gumbel-top-n resample -> contiguous sequential ids
    "pipeline_curation_dsir" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val kept = docs.filter(TextAnalysis.gopherKeep(col("text"), minWords = 20))
        .localCheckpoint() // stage materialization (see pipeline_curation)
      val fitRaw = graft.functions.Sampling.sampleByHash(kept, "doc_id", 0.5,
        salt = "graft")
      val table = graft.text.Dsir.logRatioTable(fitRaw, col("text"),
        kept.filter(col("lang") === "en"), col("text"), buckets = 512)
      val scored = kept.withColumn("dsir_logw",
        graft.text.Dsir.scoreColumn(col("text"), table))
      val top = graft.text.Dsir.resampleTop(scored, "doc_id",
        col("dsir_logw"), n = 80, salt = "graft")
      roundCols(graft.functions.Sampling.withSequentialIds(
        top.select(col("doc_id"), col("lang"), col("gumbel_key")),
        col("doc_id")), Seq("gumbel_key"))
    }),

    // leakage-safe split: near-dup cluster labels (pointer-jump CC over
    // verified minhash pairs) become the split key, so no component
    // ever straddles train/test; oracle = recursive-CTE closure + the
    // same md5 bucketing on the cluster label
    "data_leakage_split" -> ((s, dir) => {
      val c = corpus(s, dir)
      val pairs = Dedup.minhashVerifiedPairs(c, "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select("id_a", "id_b")
      graft.functions.Sampling.leakageSafeSplit(c.select(col("id")), "id",
        pairs, Seq("train" -> 0.8, "test" -> 0.2), salt = "graft")
    }),

    // token-budget source mixing (Pile/DoReMi-style weights over
    // TOKENS): per-source plan row + the md5-deterministic application
    "data_token_budget_mix" -> ((s, dir) =>
      roundCols(graft.functions.Sampling.tokenBudgetMix(
        Tables.read(s, dir, "documents"), "source", col("n_chars"),
        Seq("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0),
        budgetTokens = 20000L), Seq("target_tokens", "epochs"))),

    "data_token_budget_apply" -> ((s, dir) =>
      graft.functions.Sampling.applyTokenBudgetMix(
        Tables.read(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "source", col("n_chars"),
        Seq("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0),
        budgetTokens = 20000L, salt = "graft")
        .select(col("doc_id"), col("source"), col("keep_rate_x1000"))),

    // distribution-drift monitoring: PSI buckets + standardized mean
    // difference between the "tuned-on" corpus and the "new crawl"
    "data_psi_drift" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      roundCols(graft.functions.Drift.psi(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "n_chars"), Seq("ref_frac", "cur_frac", "psi_term"))
    }),

    // per-group drift: PSI per language — a stable global distribution
    // can hide a badly drifted tail group
    "data_psi_drift_by_lang" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      roundCols(graft.functions.Drift.psiByGroup(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "n_chars", "lang"), Seq("ref_frac", "cur_frac", "psi_term"))
    }),

    // categorical drift: the language-mix shift between the tuned-on
    // corpus and the new crawl
    "data_psi_drift_categorical" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      roundCols(graft.functions.Drift.psiCategorical(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "lang"), Seq("ref_frac", "cur_frac", "psi_term"))
    }),

    // drift in EMBEDDING SPACE: the cell-mix (nearest trained centroid)
    // comparison between the tuned-on corpus and a biased new batch —
    // scalar stats can be stable while mass concentrates in one corner
    // of embedding space. The coarse k-means (k=8, it=5, id-ordered
    // sample — the ann_ivf_topk trainer) is replicated in the DuckDB
    // oracle, so the assignment itself is verified end-to-end; the
    // "new batch" is the positive-first-component half-space, a
    // direction no scalar column monitor would see
    "data_psi_drift_embedding" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val centroids = IvfIndex.trainOrdered(coll, config,
        IvfIndex.IvfConfig(k = 8, iterations = 5), col("id").cast("long"))
      val cur = coll.filter(element_at(col("vector"), 1) > 0f)
      roundCols(graft.functions.Drift.psiEmbedding(coll, cur, "vector",
          centroids).orderBy("cell"),
        Seq("ref_frac", "cur_frac", "psi_term"))
    }),

    "data_smd_drift" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      roundCols(graft.functions.Drift.standardizedMeanDiff(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "n_chars"), Seq("ref_mean", "cur_mean", "pooled_std", "smd"))
    }),

    // farthest-point (k-center greedy) coreset: the 4-pick sequential
    // greedy replicated round-by-round in SQL — seed = min id, each
    // round's argmax(min-dist) with (dist DESC, id) tie-break
    "data_kcenter_coreset" -> ((s, dir) => {
      val base = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id").cast("string").as("id"),
          col("embedding").as("vector"))
      roundCols(graft.functions.Coreset.kCenterGreedy(base, "id", "vector",
        k = 4), Seq("center_distance"))
    }),

    // stratified deterministic sampling: rebalance a skewed corpus
    // (downsample the dominant language, keep the tail) with per-stratum
    // hash-rate thresholds — reproducible at any cluster size
    "data_stratified_sample" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").select(col("doc_id"), col("lang"))
      graft.functions.Sampling.stratifiedSampleByHash(docs, "doc_id", "lang",
        Seq("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.1, salt = "graft")
    }),

    // DoReMi-style cluster mixing: k-means topic cells over the embedding
    // column (same id-ordered k=8/it=5 training as ann_ivf_topk, so the
    // oracle replicates the centroids term-for-term), then per-cell
    // deterministic hash keep-rates — content-based domain reweighting
    // when no metadata labels exist
    "data_cluster_mix" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val ivf = IvfIndex.IvfConfig(k = 8, iterations = 5)
      val centroids = IvfIndex.trainOrdered(coll, config, ivf, col("id").cast("long"))
      graft.functions.Sampling.clusterProportionalSample(
        coll.select(col("id"), col("vector")), "id", "vector", centroids,
        fractions = Seq(0 -> 1.0, 1 -> 0.5, 2 -> 0.25),
        defaultFraction = 0.1, salt = "graft")
        .select(col("id"), col("mix_cell"))
    }),

    // GPT-style sequence packing: docs laid end-to-end in doc_id order on
    // one token stream, cut into 512-token bins; a distributed prefix sum
    // (range partition + per-partition offsets), never a global window
    "data_pack_sequences" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.wordCount(col("text")).cast("long").as("n_tokens"))
      graft.functions.Sampling.packSequences(docs, col("doc_id"), "n_tokens", 512)
    }),

    // per-domain cap: at most 15 docs per source, earliest doc_ids win —
    // the "max N documents per domain" rule of web-corpus pipelines;
    // WindowGroupLimit pre-cuts each domain map-side before the shuffle
    "data_domain_cap" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").select(col("doc_id"), col("source"))
      graft.functions.Sampling.capPerGroup(docs, "source", 15, Seq(col("doc_id")))
    }),

    // benchmark decontamination: distinct word 5-grams of each training
    // doc joined (by md5, broadcast bench side) against an eval set that
    // PLANTS verbatim copies of the first 10 training docs — those must
    // report contamination 1.0; the report is what a pipeline thresholds
    // before training so eval numbers stay honest
    "text_contamination" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val train = docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") >= 480 || col("doc_id") < 10).select(col("text"))
      roundCols(TextAnalysis.contaminationReport(train, bench, "doc_id", "text", n = 5),
        Seq("contamination"))
    }),

    // exact corpus percentiles via the distributed zipWithIndex
    "text_token_percentiles" -> ((s, dir) =>
      TextAnalysis.tokenPercentiles(
        Tables.read(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", Seq(0.25, 0.5, 0.75, 0.95))),

    // duplicate-line removal (the fix operator for frac_dup_lines):
    // inject repeats deterministically, clean, md5-compare
    "text_dedup_lines" -> ((s, dir) => {
      val noisy = Tables.read(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), lit("footer line"), col("text"),
          lit("footer line"), lit("unique tail")).as("text"))
      noisy.select(col("doc_id"),
        size(split(col("text"), "\n")).as("n_lines_before"),
        size(split(TextAnalysis.dropDuplicateLines(col("text")), "\n")).as("n_lines_after"),
        md5(TextAnalysis.dropDuplicateLines(col("text"))).as("clean_md5"))
    }),

    // tf-idf keyword extraction: two-level aggregation, rational idf
    // for cross-engine exact scores
    "text_tfidf_top" -> ((s, dir) =>
      roundCols(TextAnalysis.tfidfTopTerms(
        Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text")), "doc_id", "text", topK = 3),
        Seq("score"))),

    // PII scrub: deterministic synthetic PII injected per doc, then
    // counted and redacted — redacted text compared by md5
    "text_pii_redact" -> ((s, dir) => {
      val withPii = Tables.read(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or "),
          lit("555-"), lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-1234 from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")
        ).as("text"))
      val t = col("text")
      withPii.select(col("doc_id"),
        TextAnalysis.piiCount(t, "email").cast("int").as("n_email"),
        TextAnalysis.piiCount(t, "phone").cast("int").as("n_phone"),
        TextAnalysis.piiCount(t, "ipv4").cast("int").as("n_ipv4"),
        md5(TextAnalysis.redactPii(t)).as("redacted_md5"))
    }),

    // distributed zipWithIndex: contiguous global ids without a
    // single-partition window (range partition + offset pass)
    "data_sequential_ids" -> ((s, dir) =>
      graft.functions.Sampling.withSequentialIds(
        Tables.read(s, dir, "documents").select(col("doc_id"), length(col("text")).as("n_chars")),
        col("doc_id"))),

    // chunk-level cross-document dedup: repeated chunks (boilerplate)
    // surface as md5 groups spanning docs — chunking + dedup composed
    "chunk_dedup" -> ((s, dir) => {
      val chunks = TextAnalysis.chunkTokens(
        Tables.read(s, dir, "documents")
          .select(col("doc_id"), col("text")), "text",
        chunkSize = 20, overlap = 0)
      chunks.groupBy(md5(col("chunk")).as("chunk_md5"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") > 1)
    }),

    // fixed-size token chunking with overlap (LLM-ingest shape)
    "text_chunking" -> ((s, dir) =>
      TextAnalysis.chunkTokens(
        Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text")), "text",
        chunkSize = 40, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"),
          md5(col("chunk")).as("chunk_md5"), col("n_chunk_tokens"))),

    "text_fingerprint" -> ((s, dir) =>
      Tables.read(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
        TextAnalysis.minShingleFingerprint(col("text"), 3).as("fp_shingle"))),

    "text_simhash" -> ((s, dir) =>
      Tables.read(s, dir, "documents").select(
        col("doc_id"), TextAnalysis.simhash64(col("text")).as("simhash"))),

    // corpus top-k n-gram heavy hitters (vocabulary seeding /
    // boilerplate mining): exact two-phase count, map-side combine, the
    // deterministic (freq desc, gram asc) cut — counts AND the cut
    // replicate in SQL
    "text_top_ngrams" -> ((s, dir) =>
      TextAnalysis.topNgrams(Tables.read(s, dir, "documents"),
        col("text"), n = 3, k = 20)),

    // the mergeable Misra-Gries form of the same cut: bounded counters
    // per partition instead of a vocabulary-sized shuffle. At gate
    // scale the capacity exceeds the distinct-gram count, so NO purge
    // fires and the summary is provably exact + order-independent —
    // the sketch is gated against the SAME exact SQL oracle
    "text_top_ngrams_sketched" -> ((s, dir) =>
      TextAnalysis.topNgramsSketched(Tables.read(s, dir, "documents"),
        col("text"), n = 3, k = 20, capacity = 1 << 21)),

    // heavy-by-MASS mix audit: sources ranked by their TOKEN totals
    // (the number a data-mix budget allocates) via the WEIGHTED form of
    // the same Misra-Gries aggregate; purge-free at this cardinality,
    // so the weighted counts equal the exact groupBy-sum SQL
    "text_heavy_sources" -> ((s, dir) =>
      TextAnalysis.heavyHitters(Tables.read(s, dir, "documents"),
        col("source"), size(TextAnalysis.lowerTokens(col("text"))),
        k = 5, capacity = 1024)),

    // hashing-trick TF vectors (embedding-free content vectors): the
    // md5-bucket construction itself is verified via nnz / l2-norm /
    // argmax scalars per doc — the bridge from the text tier into the
    // vector tier when no embedding model exists
    "text_hashing_tf" -> ((s, dir) => {
      val withV = Tables.read(s, dir, "documents").filter(col("doc_id") < 64)
        .select(col("doc_id"), TextAnalysis.hashingTfVector(col("text"), 64).as("v"))
      withV.select(col("doc_id"),
        size(filter(col("v"), x => x > 0)).cast("long").as("tf_nnz"),
        (round(sqrt(graft.functions.VectorFunctions.vecDistance(
          Metric.InnerProduct, col("v"), col("v"))), 6) + lit(0.0)).as("tf_l2"),
        (array_position(col("v"), array_max(col("v"))) - 1).as("tf_argmax"))
    }),

    // exact all-pairs cosine over hashing-TF vectors: vector-space
    // near-dup detection with NO model — near copies (shared token
    // multiset) land at cosine ~1 regardless of which tokens changed
    "dedup_tfvector_cosine" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 80)
        .select(col("doc_id").as("id"),
          TextAnalysis.hashingTfVector(col("text"), 64).as("vector"))
      roundCols(Dedup.exactCosinePairs(docs, "id", "vector")
        .filter(col("cosine") >= 0.9), Seq("cosine"))
    }),

    // ---- supervised text classification (multinomial Naive Bayes —
    // the counts-based shape of pipeline language/quality classifiers;
    // training is pure aggregation, so the WHOLE model and every score
    // replicate in SQL): fit on doc_id<400 (label = lang), predict the
    // held-out 100 docs, report argmax + correctness + log posterior
    // The synthetic corpus draws every lang from ONE token pool (zero
    // real signal), so the fixture plants a deterministic per-lang
    // marker token on 2/3 of docs — learnable vocabulary with a noisy
    // tail, the regime a real language/quality classifier works in
    "text_nb_langid" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) =!= 0,
            concat(lit(" tok_"), col("lang"))).otherwise(lit(""))).as("text"))
      val train = docs.filter(col("doc_id") < 400)
      val test = docs.filter(col("doc_id") >= 400)
      val model = NaiveBayes.train(train, "doc_id", "text", "lang")
      val pred = NaiveBayes.predict(model, test, "doc_id", "text")
      roundCols(pred.join(test.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("predicted"),
          (col("predicted") === col("lang")).as("correct"), col("score")),
        Seq("score"))
    }),

    // bigram-LM perplexity scoring (the CCNet-style filter): counts
    // trained on doc_id<400, held-out docs scored by mean -ln p over
    // their bigrams in position order — low logppl = in-domain text;
    // compose with tokenPercentiles for a percentile keep rule
    "text_bigram_ppl" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val model = NgramLm.train(docs.filter(col("doc_id") < 400), "doc_id", "text")
      roundCols(NgramLm.score(model, docs.filter(col("doc_id") >= 400),
        "doc_id", "text"), Seq("logppl"))
    }),

    // corpus profile: the one-row dataset-card summary incl. the
    // Shannon entropy of the language mix
    "text_corpus_profile" -> ((s, dir) =>
      roundCols(TextAnalysis.corpusProfile(
        Tables.read(s, dir, "documents"), "text", "lang"),
        Seq("mean_tokens", "group_entropy"))),

    // blocklist screening: hits + fraction against a term list (the
    // LDNOOBW-style stage; threshold the fraction, not presence)
    "text_blocklist" -> ((s, dir) =>
      roundCols(Tables.read(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.blocklistHits(col("text"),
          Seq("spark", "fast", "slow")).as("n_hits"),
        TextAnalysis.blocklistFraction(col("text"),
          Seq("spark", "fast", "slow")).as("hit_frac")),
        Seq("hit_frac"))),

    // HTML -> training text: script/style blocks drop with content,
    // tags strip, entities decode, whitespace collapses; link density
    // is the jusText boilerplate signal. The page is synthesized
    // deterministically from the documents row (mirrored in SQL).
    "text_html_extract" -> ((s, dir) => {
      val html = synthHtml
      roundCols(Tables.read(s, dir, "documents").select(col("doc_id"),
        WebText.stripHtml(html).as("stripped"),
        WebText.linkDensity(html).as("link_density")),
        Seq("link_density"))
    }),

    // URL -> host / registered domain (eTLD+1 heuristic) / path — the
    // grouping unit for per-domain caps and domain-mix stats
    "text_url_domains" -> ((s, dir) => {
      val url = synthUrl
      Tables.read(s, dir, "documents").select(col("doc_id"),
        WebText.urlHost(url).as("host"),
        WebText.urlDomain(url).as("domain"),
        WebText.urlPath(url).as("path"))
    }),

    // canonical-URL dedup keys: www/userinfo/port/fragment/tracking
    // params stripped, params sorted — rows whose synthetic URLs differ
    // only by transport noise collapse to one key (C4's URL dedup unit)
    "text_url_canonical" -> ((s, dir) => {
      val url = synthNoisyUrl
      Tables.read(s, dir, "documents").select(col("doc_id"),
        WebText.urlCanonicalize(url).as("canonical"))
    }),

    // lexical diversity: type-token ratio + hapax fraction, the
    // template/boilerplate vs gibberish quality axes
    "text_lexical_diversity" -> ((s, dir) =>
      roundCols(Tables.read(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.typeTokenRatio(col("text")).as("ttr"),
        TextAnalysis.hapaxFraction(col("text")).as("hapax_frac")),
        Seq("ttr", "hapax_frac"))),

    // one-pass embedding-quality audit: null/non-finite/zero-norm
    // totals + norm range over the clean rows
    "emb_vector_audit" -> ((s, dir) =>
      roundCols(graft.prepare.Prepare.vectorAudit(
        Tables.read(s, dir, "embeddings"), "embedding"),
        Seq("min_norm", "avg_norm", "max_norm"))),

    // per-user behavioral features in one shuffle, exact median gap
    "events_user_features" -> ((s, dir) =>
      EventStreams.userActivityFeatures(events(s, dir))),

    // most common session paths (30-min gap): the "what do users do"
    // chains, counted and cut to the top 25
    "events_session_paths" -> ((s, dir) =>
      EventStreams.topSessionPaths(events(s, dir), gapSeconds = 1800L,
        topK = 25)),

    // exact decile binning of document length — percentile features
    // with no sketch, rank*10 div n over the (n_chars, doc_id) order
    "data_quantile_bins" -> ((s, dir) =>
      graft.functions.Sampling.quantileBin(
        Tables.read(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        struct(col("n_chars"), col("doc_id")), nBins = 10)),

    // key-skew diagnostic: the heaviest event users with share and
    // x-uniform ratio — the pre-job straggler check
    "skew_key_stats" -> ((s, dir) =>
      roundCols(graft.functions.Skew.keyStats(
        events(s, dir), col("user_id"), topK = 20),
        Seq("share", "x_uniform"))),

    // c-TF-IDF cluster labeling: top distinctive terms per language —
    // every frequency/containment term replicated in the oracle
    "text_top_terms_per_cluster" -> ((s, dir) =>
      roundCols(TextAnalysis.topTermsPerCluster(
        Tables.read(s, dir, "documents"), "lang", "text", topN = 5),
        Seq("score"))),

    // vocabulary-coverage gate (CCNet's OOV companion to perplexity):
    // fraction of each held-out doc's tokens present in the reference
    // vocabulary
    "text_vocab_coverage" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      roundCols(TextAnalysis.vocabCoverage(
        docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
        "doc_id", "text"), Seq("coverage"))
    }),

    // cross-source duplication audit: distinct-shingle overlap between
    // every source pair — no document pairs anywhere, fan-out bounded
    // by the source count
    "dedup_source_overlap" -> ((s, dir) =>
      roundCols(Dedup.sourceOverlap(
        Tables.read(s, dir, "documents"), "source", col("text")),
        Seq("jaccard_shingles"))),

    // interpolated Kneser–Ney bigram perplexity (the smoothing CCNet's
    // KenLM actually uses): absolute discount + continuation-probability
    // backoff, every probability term replicated in SQL
    "text_kn_ppl" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val model = NgramLm.trainKneserNey(
        docs.filter(col("doc_id") < 400), "doc_id", "text")
      roundCols(NgramLm.scoreKneserNey(model, docs.filter(col("doc_id") >= 400),
        "doc_id", "text"), Seq("logppl"))
    }),

    // PCA embedding compression — the ONE distributed job of PCA
    // training (upper-tri second moments; the d x d eigensolve is
    // driver-side and property-tested in PcaSpec): every covariance
    // entry replicated in SQL
    "emb_pca_covariance" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      roundCols(Pca.covariance(
        Tables.read(s, dir, "embeddings").select(col("embedding").as("vector")),
        "vector", d), Seq("cov"), scale = 9)
    }),

    // kNN graph construction (semantic clustering substrate): exact
    // O(n^2) verification path, and the IVF-blocked scale path pinned
    // IDENTICAL to it at full probes (both against ONE oracle) — the
    // correctness contract partial probing degrades from gracefully
    "knn_graph_exact" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      roundCols(KnnGraph.exact(coll, config, 5), Seq("score", "distance"))
    }),

    // retrieval evaluation: recall@5 / precision@5 / MRR / nDCG@5 of
    // the exact kNN retrieval against same-label relevance — every
    // metric term replicated in SQL
    "eval_ranking_knn" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val results = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("qid"), col("neighbor_id").as("id"), col("rank"))
      val emb = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id").cast("string").as("id"), col("label"))
      val labels = emb.select(col("id").as("qid"), col("label"))
        .join(emb, "label")
        .filter(col("qid") =!= col("id")).select("qid", "id")
      roundCols(graft.search.RankingEval.perQuery(results, labels, 5),
        Seq("recall_at_k", "precision_at_k", "mrr", "ndcg_at_k"))
    }),

    "eval_ranking_summary" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val results = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("qid"), col("neighbor_id").as("id"), col("rank"))
      val emb = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id").cast("string").as("id"), col("label"))
      val labels = emb.select(col("id").as("qid"), col("label"))
        .join(emb, "label")
        .filter(col("qid") =!= col("id")).select("qid", "id")
      roundCols(graft.search.RankingEval.summary(results, labels, 5),
        Seq("mean_recall", "mean_precision", "mean_mrr", "mean_ndcg"))
    }),

    // hard-negative mining (DPR/ANCE): top-ranked non-positives per
    // query from the exact kNN result lists, positives = same-label
    // docs — one anti-join + one WindowGroupLimit cut, no collects
    "mining_hard_negatives" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val results = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("qid"), col("neighbor_id").as("id"), col("rank"))
      val emb = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id").cast("string").as("id"), col("label"))
      val labels = emb.select(col("id").as("qid"), col("label"))
        .join(emb, "label")
        .filter(col("qid") =!= col("id")).select("qid", "id")
      graft.search.Mining.hardNegatives(results, labels, k = 3)
        .select(col("qid"), col("id"), col("rank"), col("neg_rank"))
    }),

    // contrastive training triples: each labeled (query, positive) pair
    // crossed with that query's hard negatives, fan-out capped per pair
    // — the flattened (q, d+, d-) rows an InfoNCE loader consumes
    "mining_training_triples" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val results = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("qid"), col("neighbor_id").as("id"), col("rank"))
      val emb = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id").cast("string").as("id"), col("label"))
      val labels = emb.select(col("id").as("qid"), col("label"))
        .join(emb, "label")
        .filter(col("qid") =!= col("id")).select("qid", "id")
      graft.search.Mining.trainingTriples(results, labels, k = 3,
        negsPerPair = 2)
        .select(col("qid"), col("pos_id"), col("neg_id"), col("neg_rank"))
    }),

    // PageRank over the exact kNN graph (3 synchronous power rounds,
    // d = 0.85): the prototypicality/centrality signal for curation;
    // the oracle unrolls every round over the same edge set
    "graph_pagerank_knn" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val edges = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("src"), col("neighbor_id").as("dst"))
      roundCols(graft.graph.GraphOps.pageRank(edges, iterations = 3),
        Seq("pagerank"))
    }),

    // personalized PageRank seeded at three exemplars: centrality as
    // seen from the trusted docs — same unrolled-rounds oracle with a
    // CASE teleport vector
    "graph_ppr_knn" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val edges = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("src"), col("neighbor_id").as("dst"))
      roundCols(graft.graph.GraphOps.personalizedPageRank(
        edges, Seq("0", "1", "2"), iterations = 3), Seq("pagerank"))
    }),

    "graph_degrees_knn" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val edges = KnnGraph.exact(coll, config, 5)
        .select(col("id").as("src"), col("neighbor_id").as("dst"))
      graft.graph.GraphOps.degrees(edges)
    }),

    "knn_graph_ivf_full" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .filter(col("id").cast("int") < 100)
      val centroids = IvfIndex.trainOrdered(coll, config,
        IvfIndex.IvfConfig(k = 8, iterations = 5), col("id").cast("long"))
      roundCols(KnnGraph.ivf(coll, config, centroids, 5, nprobe = 8),
        Seq("score", "distance"))
    }),

    // temperature-scaled language mixing (the mC4/PaLM rule, T=2):
    // DATA-DERIVED keep rates flatten the en-heavy corpus toward the
    // tail languages; group stats, the power-law rates, and the md5
    // membership all replicate in SQL
    "data_temperature_mix" -> ((s, dir) =>
      graft.functions.Sampling.temperatureSample(
        Tables.read(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", temperature = 2.0, targetFraction = 0.3,
        salt = "graft")),

    // LM-quality curation (the CCNet shape): Gopher gate → bigram-LM
    // logppl against a trusted-slice model (doc_id<200) → keep the
    // fluent half (EXACT corpus-median cut — order statistics, not an
    // approx sketch; the threshold is relative to the scored corpus,
    // so the whole keep rule replicates in SQL) → sequential ids
    "pipeline_curation_lmfilter" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val kept = docs.filter(TextAnalysis.gopherKeep(col("text"), minWords = 20))
        .select(col("doc_id"), col("text")).localCheckpoint()
      val model = NgramLm.train(
        docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text")),
        "doc_id", "text")
      val scored = NgramLm.score(model, kept, "doc_id", "text").localCheckpoint()
      val n = scored.count()
      val seqd = graft.functions.Sampling.withSequentialIds(scored,
        struct(col("logppl"), col("doc_id")))
      val med = seqd.filter(col("seq_id") === (n - 1) / 2)
        .select(col("logppl")).head.getDouble(0)
      val fluent = scored.filter(col("logppl") <= med)
      roundCols(graft.functions.Sampling.withSequentialIds(
        fluent.select(col("doc_id"), col("n_bigrams"), col("logppl")),
        col("doc_id")), Seq("logppl"))
    }),

    // C4-style line dedup ACROSS the corpus: synthesize multi-line
    // pages (5 shared headers, unique body slices, a blank spacer, one
    // corpus-wide footer); each repeated line survives only at its
    // first (id, pos) occurrence while blank lines always stay —
    // reconstruction + counts replicate line-for-line in SQL
    "dedup_lines_across" -> ((s, dir) => {
      val pages = Tables.read(s, dir, "documents").select(col("doc_id"),
        concat(lit("header-"), (col("doc_id") % 5).cast("string"),
          lit("\n"), substring(col("text"), 1, 60), lit("\n"), lit(" "),
          lit("\n"), lit("shared footer line")).as("text"))
      Dedup.dropDuplicateLinesAcross(pages, "doc_id", "text")
        .select("doc_id", "text_deduped", "n_lines_kept")
    }),

    // exact substring-span dedup (the ExactSubstr boilerplate strip,
    // Lee et al. 2022): a planted 25-token footer shared by docs 0-39
    // must vanish from every carrier — window hashing, the shared set,
    // flagged starts, and the per-token cut all replicate in SQL
    "dedup_shared_spans" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id").as("id"),
          when(col("doc_id") < 40,
            concat(col("text"), lit(" fz0 fz1 fz2 fz3 fz4 fz5 fz6 fz7 fz8 fz9 fz10 fz11 fz12 fz13 fz14 fz15 fz16 fz17 fz18 fz19 fz20 fz21 fz22 fz23 fz24")))
            .otherwise(col("text")).as("text"))
      Dedup.dropSharedSpans(docs, "id", col("text"), spanTokens = 20)
        .drop("clean_text")
    }),

    // REAL trained BPE (Sennrich merge loop on the distributed
    // word-frequency table; fused codegen encode): deterministic end
    // to end — ties break lexicographically — so the gate pins a
    // stored-expected fixture of the trained tokenizer's output, the
    // same strategy as the HNSW graph-walk row
    "text_bpe_tokens" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val model = Bpe.train(docs.filter(col("doc_id") < 200), "text",
        numMerges = 40)
      docs.filter(col("doc_id") >= 490).select(col("doc_id"),
        Bpe.tokenCount(col("text"), model).as("n_bpe_tokens"),
        md5(array_join(Bpe.encodeColumn(col("text"), model), " ")).as("bpe_md5"))
    }),

    // corpus-level per-dimension standardization (the quantizer-prep
    // z-score ACROSS the corpus, not within a vector): stats are a
    // bounded d-row fit, application is a pure codegen'd HOF; stats,
    // the std-0 rule, and every standardized value replicate in SQL
    "emb_standardize" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val emb = Tables.read(s, dir, "embeddings")
      val (mean, std) = Pca.trainStandardizer(
        emb.select(col("embedding").as("vector")), "vector", d)
      roundCols(emb.filter(col("vec_id") < 50)
        .select(col("vec_id").cast("int").as("id"),
          posexplode(Pca.standardizeColumn(col("embedding"), mean, std)))
        .select(col("id"), col("pos").as("i"), col("col").as("z")),
        Seq("z")) 
    }),

    // linear probe (closed-form ridge on the embedding column — the
    // FineWeb-Edu quality-scorer shape): teacher label = the 3rd
    // embedding dim (deterministic, present on both engines), features
    // = the first 2 dims, lambda = 0.001, no intercept so the whole
    // normal-equation solve is 2x2 and replicates in SQL via the
    // adjugate. Gates: the moments job, the ridge solve, and every
    // probe score end-to-end
    "emb_linear_probe" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      val feats = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 2).as("vector"),
        element_at(col("embedding"), 3).cast("double").as("y"))
      val model = graft.encode.LinearProbe.train(feats, "vector", col("y"),
        dims = 2, lambda = 0.001, fitIntercept = false)
      roundCols(feats.filter(col("vec_id") < 50)
        .select(col("vec_id").cast("int").as("id"),
          graft.encode.LinearProbe.scoreColumn(col("vector"), model).as("score")),
        Seq("score"))
    }),

    // WITHIN-doc repetition strip (the self-repetition fix operator):
    // docs 0-39 get their own first 30 tokens re-appended — the
    // repeated region keeps its first occurrence, the appended copy
    // falls; window hashes, first-occurrence rule, and the cut all
    // replicate in SQL
    "dedup_repeated_spans" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id").as("id"),
          when(col("doc_id") < 40,
            concat(col("text"), lit(" "),
              array_join(slice(TextAnalysis.tokens(col("text")), 1, 30), " ")))
            .otherwise(col("text")).as("text"))
      Dedup.dropRepeatedSpans(docs, "id", col("text"), spanTokens = 20)
        .drop("clean_text")
    }),

    // batch BM25 — N query-term-sets in ONE corpus pass (the explode +
    // join transient-inverted-index shape; cost is one scan + the
    // MATCHING pairs, independent of query count); per-query results
    // bit-identical to the single-query operator, and the zero-hit
    // query (q2) is absent from the output
    "text_bm25_search_many" -> ((s, dir) => {
      import s.implicits.{localSeqToDatasetHolder, newProductEncoder}
      val queries = Seq(
        ("q0", Seq("vector", "stream", "window")),
        ("q1", Seq("spark", "batch")),
        ("q2", Seq("zzznope"))).toDF("qid", "terms")
      Bm25.searchMany(
        Tables.read(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", queries, limit = 5)
    }),

    // interval (band) join: view -> purchase attribution within 2h,
    // same user — time-bucket blocking (<= 2 bins per left row) makes
    // it an equi-join on (user, bin) + exact band filter; the oracle
    // is the plain inequality join
    "events_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      EventStreams.intervalJoin(views, purchases, "user_id", "ts",
        lowerNs = 1L, upperNs = 7200000000000L)
        .select(col("user_id"), col("l_event_id"), col("r_event_id"),
          col("delta_ns"))
    }),

    // the SAME band join through the streaming operator's plan shape
    // (canonical r.ts BETWEEN l.ts + lower AND l.ts + upper condition —
    // what the watermarked stream-stream form runs) on batch frames:
    // gates that the streaming operator's batch degenerate case agrees
    // with an independent SQL band join, whole-second bounds so the
    // ns -> interval truncation to Spark's microsecond timestamps is
    // exact
    "events_streaming_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      EventStreams.streamingIntervalJoin(views, purchases, "user_id", "ts",
        lowerNs = 1000000000L, upperNs = 7200000000000L)
        .select(col("user_id"), col("l_event_id"), col("r_event_id"),
          col("delta_ns"))
    }),

    // ---- lexical retrieval + hybrid fusion
    // Okapi BM25 top-k: per-doc tf/dl are codegen'd HOFs over the token
    // array (no corpus-wide term explode), corpus stats (N, Σdl,
    // per-term df) are ONE small-row agg broadcast back, and the score
    // is an explicit sorted-term fold — the oracle replicates the
    // idf / tf-saturation arithmetic term-for-term
    "text_bm25_topk" -> ((s, dir) =>
      Bm25.topK(
        Tables.read(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", Seq("vector", "stream", "window"), limit = 10)),

    // the SAME ranking served from a PREBUILT lexicon (df/N/avgdl from
    // the persisted stats, zero aggregation jobs at query time) — the
    // lexical sibling of the persisted-index lifecycle, pinned against
    // the inline oracle
    "text_bm25_lexicon" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").select(col("doc_id"), col("text"))
      val lex = Bm25.buildLexicon(docs, "doc_id", "text")
      Bm25.topKWithLexicon(docs, "doc_id", "text", lex,
        Seq("vector", "stream", "window"), limit = 10)
    }),

    // RRF hybrid fusion: BM25 lexical top-50 + exact flat-cosine vector
    // top-50 (doc_id ≡ vec_id in the fixtures), fused by reciprocal
    // rank 1/(60+rank) — rank-based, so the incomparable score scales
    // never need calibrating; both rankings and the fused sum replicate
    // in SQL
    "hybrid_bm25_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lex = Bm25.topK(
        Tables.read(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", Seq("vector", "stream", "window"), limit = 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rank"))
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val vec = Search.flatSearch(coll, config, Tables.queryVector(s, dir, 0L), 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("distance").asc, col("id").asc)))
        .select(col("id").cast("int").as("doc_id"), col("rank"))
      graft.search.Fusion.rrf(Seq("lex" -> lex, "vec" -> vec), "doc_id",
        limit = 10)
    }),

    // ---- dedup
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicates(corpus(s, dir), "id", col("text"))
        .select("id", "canonical_id", "is_dup")),

    "dedup_minhash_pairs" -> ((s, dir) =>
      roundCols(Dedup.minhashVerifiedPairs(corpus(s, dir), "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5), Seq("jaccard"))),

    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(corpus(s, dir), "id", col("text"), maxHamming = 3)),

    // connected components over the verified minhash pairs: pointer-jump
    // label propagation must equal DuckDB's recursive-CTE transitive
    // closure (cluster_id = min reachable id)
    "dedup_clusters" -> ((s, dir) => {
      val c = corpus(s, dir)
      val pairs = Dedup.minhashVerifiedPairs(c, "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select("id_a", "id_b")
      Dedup.clusters(c.select(col("id")), "id", pairs)
    }),

    // snapshot diff: added / removed / changed ids between two corpus
    // epochs — the small output, never a materialized copy
    "store_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val before = docs.filter(col("doc_id") < 300)
        .select(col("doc_id").as("id"), col("text"))
      val after = docs.filter(col("doc_id") >= 100 && col("doc_id") < 400)
        .select(col("doc_id").as("id"),
          when(col("doc_id") < 150, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      graft.store.CollectionStore.diffSnapshots(before, after, "id")
    }),

    // duplicate-mass histogram: cluster-size distribution over the
    // same verified-pair components as dedup_clusters
    "dedup_cluster_histogram" -> ((s, dir) => {
      val c = corpus(s, dir)
      val pairs = Dedup.minhashVerifiedPairs(c, "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select("id_a", "id_b")
      Dedup.clusterSizeHistogram(Dedup.clusters(c.select(col("id")), "id", pairs))
    }),

    // canonical-key exact dedup: NFC + casefold + whitespace-collapse
    // before hashing, so NFD/NFC encoding accidents and case/spacing
    // noise can't defeat the cut — planted NFD twins (combining acute)
    // must land in the same md5 group as their precomposed NFC copies
    "dedup_exact_canonical" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 50)
      val aug = docs.select(col("doc_id").cast("long").as("id"), col("text"))
        .union(docs.select((col("doc_id") + 50000).cast("long").as("id"),
          // NFD + uppercase + doubled spaces
          concat(col("text"), lit(" CAFE\u0301  TOUCHE\u0301")).as("text")))
        .union(docs.select((col("doc_id") + 60000).cast("long").as("id"),
          // NFC precomposed + lowercase + padding
          concat(col("text"), lit("  caf\u00e9 touch\u00e9 ")).as("text")))
      aug.groupBy(md5(TextAnalysis.canonicalize(col("text"))).as("canon_md5"))
        .agg(count(lit(1)).as("n_members"), min(col("id")).as("canonical_id"))
    }),

    // quality-aware keep: each near-dup cluster survives through its
    // LONGEST member (ties by id) instead of the canonical minimum —
    // closure + per-cluster argmax replicated in the oracle
    "dedup_keep_best" -> ((s, dir) => {
      val c = corpus(s, dir)
      val pairs = Dedup.minhashVerifiedPairs(c, "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select("id_a", "id_b")
      Dedup.keepBestPerCluster(c, "id", pairs, length(col("text")))
        .select(col("id"), col("cluster_id"),
          col("keep_score").cast("long").as("keep_score"))
    }),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      roundCols(Dedup.exactJaccardPairs(
        Tables.read(s, dir, "documents").filter(col("doc_id") < 60), "doc_id",
        col("text"), 2).filter(col("jaccard") >= 0.02), Seq("jaccard"))),

    // batch-vs-corpus (incremental-ingest) dedup: a new "crawl" (exact
    // copies, near copies, and genuinely new docs) against the at-rest
    // corpus. Asymmetric: only (batch, corpus) bands join — never
    // corpus x corpus — and corpus rows are never flagged.
    "dedup_against_pairs" -> ((s, dir) =>
      roundCols(Dedup.minhashMatchesAgainst(
        dedupCorpusSide(s, dir), dedupBatchSide(s, dir), "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5), Seq("jaccard"))),

    "dedup_novel_against" -> ((s, dir) =>
      Dedup.dropNearAgainst(
        dedupCorpusSide(s, dir), dedupBatchSide(s, dir), "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select("id")),

    // bloom-pruned exact against-cut: definite bloom negatives skip the
    // join entirely, positives are cleared by the semi-pruned anti-join
    // — the result is EXACT, so the oracle is the plain NOT-IN
    "dedup_exact_against_bloom" -> ((s, dir) =>
      Dedup.dropExactAgainstBloom(
        dedupCorpusSide(s, dir), dedupBatchSide(s, dir), col("text"))
        .select("id")),

    "dedup_simhash_against" -> ((s, dir) =>
      Dedup.simhashMatchesAgainst(
        dedupCorpusSide(s, dir), dedupBatchSide(s, dir), "id", col("text"),
        maxHamming = 3)),

    "dedup_embedding_pairs" -> ((s, dir) =>
      roundCols(Dedup.exactCosinePairs(
        Tables.read(s, dir, "embeddings").filter(col("vec_id") < 300)
          .select(col("vec_id").as("id"), col("embedding").as("vector")),
        "id", "vector").filter(col("cosine") >= 0.35), Seq("cosine"))),

    // LSH-bucketed near-dup + ANN paths: the hash-derived hyperplanes
    // are replicated bit-exactly in SQL (u64 SplitMix over HUGEINT), so
    // even the candidate sets are oracle-checked
    "dedup_embedding_lsh" -> ((s, dir) =>
      roundCols(Dedup.embeddingPairs(
        Tables.read(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vector")),
        "id", "vector", CosineLsh.LshConfig(bands = 24, bitsPerBand = 6),
        threshold = 0.3), Seq("cosine"))),

    // SemDeDup (semantic dedup): k-means cells — trained on the
    // ORIGINAL embeddings, one model per corpus generation — as the
    // candidate groups, exact cosine verify at 0.9, canonical-min
    // keep. Planted semantic near-dups: vec_id<30 re-added as
    // id+10000 with dim-0 perturbed by +0.25 — cosine ~0.97 against a
    // 0.51 background ceiling, so the threshold separates cleanly.
    // The oracle replicates centroids, cell assignment, pair set, AND
    // the connected-component closure.
    "dedup_semantic_pairs" -> ((s, dir) => {
      val (corpus, centroids) = semanticFixture(s, dir)
      roundCols(Dedup.semanticPairs(corpus, "id", "vector", centroids, 0.9)
        .withColumn("cell", col("cell").cast("int")), Seq("cosine"))
    }),

    "dedup_semantic_keep" -> ((s, dir) => {
      val (corpus, centroids) = semanticFixture(s, dir)
      Dedup.dropSemanticDuplicates(corpus, "id", "vector", centroids, 0.9)
        .select("id")
    }),

    // INCREMENTAL curation: the end-to-end shape of ingesting a new
    // crawl against a dataset already at rest — quality gate on the
    // batch, exact-against cut (corpus keys), near-against cut
    // (two-sided minhash), then stable sequential ids over the novel
    // keepers. Planted exact and near copies of corpus docs must fall
    // to their respective stages; genuinely new docs survive.
    "pipeline_curation_incremental" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") < 400)
        .select(col("doc_id").as("id"), col("text"))
      val batch = docs.filter(col("doc_id") >= 400)
        .select(col("doc_id").as("id"), col("lang"), col("text"))
        .union(docs.filter(col("doc_id") < 10).select(
          (col("doc_id") + 40000).as("id"), col("lang"), col("text")))
        .union(docs.filter(col("doc_id") < 30).select(
          (col("doc_id") + 50000).as("id"), col("lang"),
          concat(col("text"), lit(" zzextra")).as("text")))
      val kept = batch.filter(TextAnalysis.gopherKeep(col("text"), minWords = 20))
        .localCheckpoint() // stage materialization (see pipeline_curation)
      val afterExact = Dedup.dropExactAgainst(corpus, kept, col("text"))
      val novel = Dedup.dropNearAgainst(corpus, afterExact, "id", col("text"),
        k = 3, numHashes = 8, bands = 4, threshold = 0.5)
      graft.functions.Sampling.withSequentialIds(
        novel.select(col("id"), col("lang")), col("id"))
    }),

    // embedding-space batch-vs-corpus novelty: older vectors are the
    // at-rest corpus, newer ones the incoming batch; hyperplanes are
    // seed-derived (data-independent), so the two-sided band keys
    // replicate with the same SplitMix SQL as the symmetric row
    "dedup_embedding_against" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vector"))
      roundCols(Dedup.embeddingMatchesAgainst(
        emb.filter(col("id") < 400), emb.filter(col("id") >= 400),
        "id", "vector", CosineLsh.LshConfig(bands = 24, bitsPerBand = 6),
        threshold = 0.3), Seq("cosine"))
    }),

    "ann_lsh_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(CosineLsh.search(coll, config,
        CosineLsh.LshConfig(bands = 24, bitsPerBand = 6), q, 10).drop("metadata"),
        Seq("score", "distance"))
    }),

    // HNSW parity shim (driver graph, deterministic FNV-1a levels);
    // gated against a stored-expected fixture oracle (the deterministic
    // build's sf0.01 top-10 as a VALUES literal); top-1/recall and
    // rebuild determinism asserted in HnswSpec
    "ann_hnsw_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      // build once per process, like the reference's bench regime
      // (Benchee builds the index, then times searches) and like the
      // quantized rows' cachedLayout — repeat invocations measure the
      // search, the first invocation pays the build
      val g = hnswShimCache.getOrElseUpdate(dir, {
        val coll = Tables.embeddingsCollection(s, dir, config)
        graft.index.Hnsw.build(coll, config)
      })
      val q = graft.search.Search.prepareQuery(config, Tables.queryVector(s, dir, 0L))
      val hits = g.search(q, 10)
      import s.implicits._
      roundCols(hits.toSeq.toDF("id", "raw")
        .select(col("id"), col("raw").as("score")), Seq("score"))
    }),

    // DISTRIBUTED hnsw (the no-row-cap path): 4 hash-shards, each task
    // builds its own graph from id-sorted rows and answers the query;
    // exact merge over the per-shard top-10. Deterministic end to end
    // (hash partition + sorted insertion + FNV-1a levels), so it gets
    // the same stored-expected fixture oracle as the driver shim.
    "ann_hnsw_sharded_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      import s.implicits._
      val queries = Seq(("q0", Tables.queryVector(s, dir, 0L).toSeq))
        .toDF("qid", "qvector")
      roundCols(graft.index.ShardedHnsw
        .searchMany(coll, config, queries, 10, shards = 4,
          cacheKey = s"gate_sharded_hnsw@$dir")
        .select(col("id"), col("score")), Seq("score"))
    }),

    // PERSISTED sharded layout (build-once/serve-thereafter, like the
    // quantized cachedLayout rows): shard graphs reconstruct from
    // stored adjacency with zero distance computations. Same shard
    // count + params as the build-path row above, and Hnsw.fromState
    // round-trips bit-exactly, so the SAME stored-expected fixture
    // oracle pins it.
    "ann_hnsw_persisted_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val base = cachedLayout(s, dir, "hnsw4") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        graft.index.ShardedHnsw.writeLayout(coll.drop("metadata"), config,
          p, shards = 4)
      }
      import s.implicits._
      val queries = Seq(("q0", Tables.queryVector(s, dir, 0L).toSeq))
        .toDF("qid", "qvector")
      roundCols(graft.index.ShardedHnsw
        .searchManyPersisted(s, base, config, queries, 10, cacheKey = base)
        .select(col("id"), col("score")), Seq("score"))
    }),

    // FILTERED sharded-HNSW search: post-filter with oversampled beams
    // (graph nodes hold only id+vector, so the predicate prunes the
    // merged candidate set against the collection scan). At sf0.01 the
    // oversampled beams (4 shards x 40 candidates of ~150 rows) recover
    // the EXACT filtered top-10, so the oracle is the filtered
    // flat-cosine SQL — data-derived, unlike the stored-expected hnsw
    // fixtures, so it survives a testdata regeneration.
    "ann_hnsw_filtered_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      import s.implicits._
      val queries = Seq(("q0", Tables.queryVector(s, dir, 0L).toSeq))
        .toDF("qid", "qvector")
      // same corpus/config/shards/params as ann_hnsw_sharded_topk and
      // graphs are filter-independent — share its cache key so one
      // build serves both rows
      roundCols(graft.index.ShardedHnsw
        .searchMany(coll, config, queries, 10, shards = 4,
          cacheKey = s"gate_sharded_hnsw@$dir",
          filter = Some(col("id") >= "5"), oversample = 4)
        .select(col("id"), col("score")), Seq("score"))
    }),

    // Vamana (DiskANN-style flat graph, engine extension): 4 hash-shards,
    // each task bulk-builds its graph from id-sorted rows (two-pass
    // α-robust prune, medoid entry) and answers the query; exact merge
    // over per-shard top-10s. At the gate scale the autoscaled serving
    // beam (320 for k=10) exceeds every shard's row count, the walk
    // covers each connected shard graph fully, and VamanaSpec pins
    // connectivity — so the result EQUALS exact flat search and the
    // oracle is the data-derived flat-cosine SQL (survives testdata
    // regeneration, unlike a stored fixture). If this row ever fails
    // with the list's TAIL differing, a shard graph lost connectivity —
    // that is a real regression, not an oracle artifact.
    "ann_vamana_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      import s.implicits._
      val queries = Seq(("q0", Tables.queryVector(s, dir, 0L).toSeq))
        .toDF("qid", "qvector")
      roundCols(graft.index.ShardedVamana
        .searchMany(coll, config, queries, 10, shards = 4,
          cacheKey = s"gate_sharded_vamana@$dir")
        .select(col("id"), col("score")), Seq("score"))
    }),

    // PERSISTED vamana layout (flat adjacency at rest, zero distance
    // computations on open): bit-identical to the build-path search
    // (Vamana.fromState round-trip, pinned in VamanaSpec), same oracle
    "ann_vamana_persisted_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val base = cachedLayout(s, dir, "vamana4") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        graft.index.ShardedVamana.writeLayout(coll.drop("metadata"), config,
          p, shards = 4)
      }
      import s.implicits._
      val queries = Seq(("q0", Tables.queryVector(s, dir, 0L).toSeq))
        .toDF("qid", "qvector")
      roundCols(graft.index.ShardedVamana
        .searchManyPersisted(s, base, config, queries, 10, cacheKey = base)
        .select(col("id"), col("score")), Seq("score"))
    }),

    // FILTERED vamana: post-filter with oversampled beams against the
    // collection scan (same contract as ann_hnsw_filtered_topk); the
    // oversampled beams recover the exact filtered top-10 at the gate
    // scale, so the oracle is the filtered flat-cosine SQL
    "ann_vamana_filtered_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      import s.implicits._
      val queries = Seq(("q0", Tables.queryVector(s, dir, 0L).toSeq))
        .toDF("qid", "qvector")
      roundCols(graft.index.ShardedVamana
        .searchMany(coll, config, queries, 10, shards = 4,
          cacheKey = s"gate_sharded_vamana@$dir",
          filter = Some(col("id") >= "5"), oversample = 4)
        .select(col("id"), col("score")), Seq("score"))
    }),

    // BATCH vamana: 4 queries against the same shard graphs — one
    // broadcast of the query block, per-shard walks, exact merge
    "ann_vamana_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector"))
      roundCols(graft.index.ShardedVamana
        .searchMany(coll, config, qs, 5, shards = 4,
          cacheKey = s"gate_sharded_vamana@$dir")
        .select(col("qid"), col("id"), col("score")), Seq("score"))
    }),

    // IVF: probing every cell must equal exact flat search (oracle =
    // the flat-cosine SQL); partial probe is the approximate scale path
    "ann_ivf_full_probe_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val ivf = IvfIndex.IvfConfig(k = 8, iterations = 5)
      val centroids = IvfIndex.train(coll, config, ivf)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(IvfIndex.search(coll, config, centroids, q, 10, nprobe = 8)
        .drop("metadata"), Seq("score", "distance"))
    }),

    // cell-partitioned at-rest layout: write partitioned by ivf_cell,
    // probe ALL cells -> must equal exact flat search (same oracle);
    // partial probes of this layout prune whole directories before IO
    "ann_ivf_partitioned_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      // train-once/load-thereafter like the quantized rows: the measured
      // cost is directory-pruned scan + search, not k-means + rewrite
      val base = cachedLayout(s, dir, "ivfflat_cos") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val centroids = IvfIndex.train(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 5))
        IvfIndex.writePartitioned(coll.drop("metadata"), centroids, p)
      }
      val centroids = IvfIndex.loadModel(s, base)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(IvfIndex.searchPartitioned(s, base, config, centroids, q, 10,
        nprobe = 8).drop("metadata"), Seq("score", "distance"))
    }),

    // FILTERED ANN over the same partitioned layout: a metadata
    // predicate rides the probed scan (PushedFilters beside the
    // ivf_cell PartitionFilters — asserted in IvfSpec), and top-k ranks
    // the FILTERED rows. Full probe makes it exactly the filtered exact
    // search, so the oracle is the flat-cosine SQL with the same WHERE.
    "ann_ivf_filtered_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val base = cachedLayout(s, dir, "ivfflat_cos") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val centroids = IvfIndex.train(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 5))
        IvfIndex.writePartitioned(coll.drop("metadata"), centroids, p)
      }
      val centroids = IvfIndex.loadModel(s, base)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(IvfIndex.searchPartitioned(s, base, config, centroids, q, 10,
        nprobe = 8, filter = Some(col("id") >= "5")).drop("metadata"),
        Seq("score", "distance"))
    }),

    // partial probe with id-ordered sample training: the k-means itself
    // is replicated in the DuckDB oracle (recursive-CTE Lloyd's), so the
    // approximate candidate set is verified end-to-end
    "ann_ivf_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val ivf = IvfIndex.IvfConfig(k = 8, iterations = 5)
      val centroids = IvfIndex.trainOrdered(coll, config, ivf, col("id").cast("long"))
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(IvfIndex.search(coll, config, centroids, q, 10, nprobe = 2)
        .drop("metadata"), Seq("score", "distance"))
    }),

    // adaptive probing of the same id-ordered-trained index: probe every
    // cell within 1.2x the nearest cell's squared distance (max 4) —
    // probes widen exactly where the coarse quantizer is ambiguous; the
    // oracle replicates the ratio cutoff on the replicated k-means
    "ann_ivf_adaptive_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val ivf = IvfIndex.IvfConfig(k = 8, iterations = 5)
      val centroids = IvfIndex.trainOrdered(coll, config, ivf, col("id").cast("long"))
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(IvfIndex.searchAdaptive(coll, config, centroids, q, 10,
        ratio = 1.2, maxProbe = 4).drop("metadata"), Seq("score", "distance"))
    }),

    // SQ8 int8 quantization: per-dim min/max affine codes (4x smaller at
    // rest), ADC candidate cut, exact rerank; every arithmetic step is
    // mirrored in the SQL oracle, so the candidate set itself is verified
    // train-once/load-thereafter (cachedLayout): the measured cost is
    // codes-scan + ADC + rerank, not k-means/min-max + encode
    "ann_sq8_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "sq8") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val m = Sq8.train(coll)
        Sq8.withCodes(coll, m).select("id", "value", "vector", "sq8_codes")
          .write.mode("overwrite").parquet(p)
        ModelStore.saveSq8(s, sidecar(p), m)
      }
      val model = ModelStore.loadSq8(s, sidecar(base))
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Sq8.search(s.read.parquet(base), config, model, q, 10,
        candidates = 50).drop("metadata"), Seq("score", "distance"))
    }),

    // PQ product quantization (m=4 subspaces, k=8 codewords): per-subspace
    // k-means replicated in the oracle as parallel recursive-CTE Lloyd's,
    // ADC candidate cut, exact rerank
    "ann_pq_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "pq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val cb = Pq.trainOrdered(coll, config,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256),
          col("id").cast("long"))
        Pq.withCodes(coll, cb).select("id", "value", "vector", "pq_codes")
          .write.mode("overwrite").parquet(p)
        ModelStore.savePq(s, sidecar(p), cb)
      }
      val cb = ModelStore.loadPq(s, sidecar(base))
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Pq.search(s.read.parquet(base), config, cb, q, 10,
        candidates = 50).drop("metadata"), Seq("score", "distance"))
    }),

    // anisotropic (score-aware) PQ: ScaNN's codebook loss (Guo et al.,
    // ICML 2020) over the SAME Pq machinery. The anisotropic k-means
    // update is a per-centroid linear solve with no tractable SQL
    // mirror, so this row pins the family EQUIVALENCE contract —
    // candidates cover the corpus, the exact rerank makes the cut
    // exhaustive, and the result must equal exact flat cosine. The
    // codebook claims themselves are ScalaTest-gated (AnisotropicPqSpec:
    // eta=1 reduces to plain PQ bit-for-bit, the trainer beats plain
    // codebooks on the anisotropic objective, candidate recall >= plain
    // at the same budget)
    "ann_apq_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val cb = AnisotropicPq.trainOrdered(coll, config,
        Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256),
        col("id").cast("long"))
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Pq.search(coll, config, cb, q, 10,
        candidates = 1000000, codesCol = "apq_codes").drop("metadata"),
        Seq("score", "distance"))
    }),

    // OPQ-rotated PQ for the cosine/IP family: a SplitMix-seeded
    // sign-Hadamard rotation (R = H·D/sqrt(d), exactly orthonormal)
    // decorrelates the subspaces before the same PQ pipeline — the
    // structured-OPQ idea (Ge et al. CVPR 2013; Ailon-Chazelle FJLT).
    // Signs, Hadamard terms, accumulation order, and the f32 cast all
    // replicate in the oracle, so the rotated candidate set is verified.
    "ann_opq_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val rcfg = config.copy(normalize = Some(Normalize.None))
      val base = cachedLayout(s, dir, "opq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val sgn = Opq.signs(d, seed = 7L)
        val rot = Opq.withRotated(coll, sgn) // unit stays unit (orthonormal)
        val cb = Pq.trainOrdered(rot, rcfg,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256),
          col("id").cast("long"))
        // at rest: ROTATED vectors + codes (rerank happens in the
        // rotated space; the rotation is orthonormal, rankings agree)
        Pq.withCodes(rot, cb).select("id", "value", "vector", "pq_codes")
          .write.mode("overwrite").parquet(p)
        ModelStore.saveOpq(s, sidecar(p), 7L, cb)
      }
      val (seed, cb) = ModelStore.loadOpq(s, sidecar(base))
      val q = Opq.rotate(
        graft.search.Search.prepareQuery(config, Tables.queryVector(s, dir, 0L)),
        Opq.signs(d, seed))
      roundCols(Pq.search(s.read.parquet(base), rcfg, cb, q, 10,
        candidates = 50).drop("metadata"), Seq("score", "distance"))
    }),

    // RaBitQ calibrated binary quantization (Gao & Long, SIGMOD 2024):
    // sign-Hadamard rotation, 1 bit/dim + two f64 calibration factors,
    // estimated-L2 candidate cut, exact rerank. The ESTIMATOR itself is
    // gated (not just the reranked output): the encode row below pins
    // the packed word, both factors, and the estimated distance per id
    "ann_rabitq_estimator" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val model = rabitqModel(s, dir, d)
      val coded = graft.ann.RaBitQ.withCodes(
        Tables.embeddingsCollection(s, dir, config), model)
      val qp = graft.ann.RaBitQ.prepareQueryRot(model,
        Search.prepareQuery(config, Tables.queryVector(s, dir, 0L)))
      roundCols(coded.filter(col("id").cast("long") < 64).select(
        col("id"),
        element_at(col("rabitq.codes"), 1).as("word0"),
        col("rabitq.rnorm").as("rnorm"),
        col("rabitq.sabs").as("sabs"),
        graft.ann.RaBitQ.rankColumn(model, qp, 0)(col("rabitq")).as("est_l2sq")),
        Seq("rnorm", "sabs", "est_l2sq"))
    }),

    "ann_rabitq_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "rabitq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val m = graft.ann.RaBitQ.train(coll, rabitqConfig(d))
        graft.ann.RaBitQ.withCodes(coll, m)
          .select("id", "value", "vector", "rabitq")
          .write.mode("overwrite").parquet(p)
        ModelStore.saveRabitq(s, sidecar(p), m)
      }
      val model = ModelStore.loadRabitq(s, sidecar(base))
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(graft.ann.RaBitQ.search(s.read.parquet(base), config, model,
        q, 10, candidates = 50).drop("metadata"), Seq("score", "distance"))
    }),

    // batch RaBitQ: 4 queries rotate in plan and share ONE codes-only
    // scan; per-qid estimated cut, shared exact batch rerank — per-query
    // results equal the single form (the oracle re-keys every global
    // cut as a per-qid window)
    "ann_rabitq_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val model = rabitqModel(s, dir, d)
      val coded = graft.ann.RaBitQ.withCodes(
        Tables.embeddingsCollection(s, dir, config), model)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(graft.ann.RaBitQ.searchMany(coded, config, model, qs, 5,
        candidates = 50, knownNq = 4L), Seq("score", "distance"))
    }),

    // IVF-PQ: coarse cells prune, m-byte ADC codes score, exact rerank —
    // the standard billion-vector layout; BOTH k-means (coarse + per-
    // subspace) replicated in the oracle, so cells, probe set, and the
    // ADC candidate cut are verified end-to-end
    "ann_ivfpq_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfpq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val order = col("id").cast("long")
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), order)
        val cb = Pq.trainOrdered(coll, config,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256), order)
        graft.ann.IvfPq.writePartitioned(coll.drop("metadata"), cents, cb, p)
      }
      val (cents, cb, _) = graft.ann.IvfPq.loadModel(s, base)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(graft.ann.IvfPq.searchPartitioned(s, base, config, cents, cb,
        q, 10, nprobe = 2, candidates = 50).drop("metadata"),
        Seq("score", "distance"))
    }),

    // FAISS-style residual IVF-PQ: codes quantize v - centroid[cell];
    // each probed cell scores against its own query-residual ADC table
    "ann_ivfpq_residual_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfpq_res") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val order = col("id").cast("long")
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), order)
        val cb = graft.ann.IvfPq.trainResidual(coll, config, cents,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256), order)
        graft.ann.IvfPq.writePartitionedResidual(coll.drop("metadata"), cents, cb, p)
      }
      val (cents, cb, residual) = graft.ann.IvfPq.loadModel(s, base)
      require(residual, "expected a residual sidecar")
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(graft.ann.IvfPq.searchPartitionedResidual(s, base, config,
        cents, cb, q, 10, nprobe = 2, candidates = 50).drop("metadata"),
        Seq("score", "distance"))
    }),

    // same pipeline over the cell-partitioned at-rest layout: the probe
    // prunes whole directories (PartitionFilters), and the search runs
    // on the model LOADED from the layout's sidecar — trained and loaded
    // artifacts must be bit-identical for this row to hash-match. The
    // write path itself is exercised on the first (cold-cache) build and
    // by ScaleSpec's fresh-write tests
    "ann_ivfpq_partitioned_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      // shares the "ivfpq" cached layout with the batch rows: one
      // training + one partitioned write serve every query shape
      val base = cachedLayout(s, dir, "ivfpq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val order = col("id").cast("long")
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), order)
        val cb = Pq.trainOrdered(coll, config,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256), order)
        graft.ann.IvfPq.writePartitioned(coll.drop("metadata"), cents, cb, p)
      }
      val (lc, lcb, _) = graft.ann.IvfPq.loadModel(s, base)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(graft.ann.IvfPq.searchPartitioned(s, base, config, lc, lcb,
        q, 10, nprobe = 2, candidates = 50).drop("metadata"),
        Seq("score", "distance"))
    }),

    // batch IVF-PQ: FOUR queries answered by one codes-only scan — the
    // training-pipeline shape (reference's batched-NIF idiom,
    // nifs.rs:151-175). Per-query probe sets, ADC candidate cuts, and
    // exact reranks all replicate in the oracle's per-qid windows.
    "ann_ivfpq_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      // shares ann_ivfpq_topk's cached layout + sidecar: one training,
      // every query shape (single, batch) loads the same artifacts
      val base = cachedLayout(s, dir, "ivfpq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val order = col("id").cast("long")
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), order)
        val cb = Pq.trainOrdered(coll, config,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256), order)
        graft.ann.IvfPq.writePartitioned(coll.drop("metadata"), cents, cb, p)
      }
      val (cents, cb, _) = graft.ann.IvfPq.loadModel(s, base)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector"))
      roundCols(graft.ann.IvfPq.searchMany(s.read.parquet(base), config,
        cents, cb, qs, 10, nprobe = 2, candidates = 50),
        Seq("score", "distance"))
    }),

    // batch search over the partitioned at-rest layout with STATIC cell
    // pruning: the probe union (computed from the query frame alone)
    // becomes a partition filter, so non-probed cell directories are
    // never read — same oracle as ann_ivfpq_search_many because the
    // results are identical, only the scan shrinks
    "ann_ivfpq_partitioned_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfpq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val order = col("id").cast("long")
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), order)
        val cb = Pq.trainOrdered(coll, config,
          Pq.PqConfig(m = 4, k = 8, iterations = 3, sampleSize = 256), order)
        graft.ann.IvfPq.writePartitioned(coll.drop("metadata"), cents, cb, p)
      }
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector"))
      roundCols(graft.ann.IvfPq.searchManyPartitioned(s, base, config,
        qs, 10, nprobe = 2, candidates = 50, knownNq = 4L),
        Seq("score", "distance"))
    }),

    // IVF x RaBitQ (Gao & Long SIGMOD 2024, the paper's IVF deployment
    // form): coarse cells prune to nprobe=2 directories, rows carry
    // 1-bit RaBitQ codes of the residual v - centroid[cell], and the
    // candidate cut ranks by the CALIBRATED estimated L2^2 — coarse
    // k-means, per-cell Hadamard rotations, factors, estimator,
    // candidate set, and exact rerank ALL replicate in the oracle
    "ann_ivfrabitq_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfrabitq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), col("id").cast("long"))
        graft.ann.IvfRaBitQ.writePartitioned(coll.drop("metadata"),
          graft.ann.IvfRaBitQ.Model(cents, rabitqConfig(d)), p)
      }
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(graft.ann.IvfRaBitQ.searchPartitioned(s, base, config, q, 10,
        nprobe = 2, candidates = 50).drop("metadata"),
        Seq("score", "distance"))
    }),

    // batch IVF x RaBitQ: per-(query, probed cell) rotations ride the
    // plan; ONE codes-only scan of the probe union scores every pair;
    // per-qid estimated cut + shared exact rerank — per-query results
    // equal the single form over the same partitioned layout
    "ann_ivfrabitq_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfrabitq") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), col("id").cast("long"))
        graft.ann.IvfRaBitQ.writePartitioned(coll.drop("metadata"),
          graft.ann.IvfRaBitQ.Model(cents, rabitqConfig(d)), p)
      }
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector"))
      roundCols(graft.ann.IvfRaBitQ.searchManyPartitioned(s, base, config,
        qs, 5, nprobe = 2, candidates = 50, knownNq = 4L),
        Seq("score", "distance"))
    }),

    // plain-IVF batch over the partitioned layout (no PQ codes — exact
    // distances inside probed cells): same static probe-union pruning,
    // centroids loaded from the sidecar; the oracle replicates the
    // k-means, the per-query probe sets, and the exact in-cell top-k
    "ann_ivf_partitioned_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfflat") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), col("id").cast("long"))
        IvfIndex.writePartitioned(coll.select("id", "value", "vector"), cents, p)
      }
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector"))
      roundCols(IvfIndex.searchManyPartitioned(s, base, config, qs, 10,
        nprobe = 2), Seq("score", "distance"))
    }),

    // filtered BATCH ANN on the partial-probe path: probes still come
    // from the queries alone (the model is trained on the FULL corpus;
    // the predicate only filters stored rows at search time), so the
    // oracle replicates the same k-means + probe CTEs and adds the
    // WHERE at the in-cell candidate stage — the approximate filtered
    // candidate set is verified end to end, not just "rows come back".
    "ann_ivf_filtered_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val base = cachedLayout(s, dir, "ivfflat") { p =>
        val coll = Tables.embeddingsCollection(s, dir, config)
        val cents = IvfIndex.trainOrdered(coll, config,
          IvfIndex.IvfConfig(k = 8, iterations = 3), col("id").cast("long"))
        IvfIndex.writePartitioned(coll.select("id", "value", "vector"), cents, p)
      }
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"),
          col("embedding").as("qvector"))
      roundCols(IvfIndex.searchManyPartitioned(s, base, config, qs, 10,
        nprobe = 2, filter = Some(col("id") >= "3")), Seq("score", "distance"))
    }),

    // ---- multimodal: REAL image decode (javax.imageio) over PNG fixtures
    // generated from known pixels — the oracle replicates the fixture
    // arithmetic (two-tone image: left ceil(w/2) columns the doc_id-derived
    // RGB, rest black), so a hash match proves the codec actually read the
    // header AND traversed the pixels.
    "mm_decode_meta" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
      val media = Multimodal.pngFixtures(docs, batchSize = 32)
      val dec = Multimodal.decodeImagesReal(media, "payload", batchSize = 32)
      dec.select(col("doc_id"), col("width"), col("height"),
        col("channels"), col("sum_r"), col("sum_g"), col("sum_b"))
    }),

    // REAL image resize (pure-JDK bilinear: align-corners=false source
    // sampling, edge clamp, round-half-up). With the power-of-two 32x32
    // target, every sample coordinate and weight is an exact dyadic
    // double, so the oracle replicates the interpolation itself
    // closed-form (generate_series over destination columns) — a hash
    // match proves the actual bilinear weights, not just the batching.
    "mm_resize" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
      val media = Multimodal.pngFixtures(docs, batchSize = 32)
      Multimodal.resizeImagesReal(media, "payload", 32, 32, batchSize = 32)
        .select(col("doc_id"), col("resized_width"), col("resized_height"),
          col("resized_sum_r"), col("resized_sum_g"), col("resized_sum_b"))
    }),

    // real audio decode (javax.sound.sampled, the JDK's WAV codec) over
    // PCM fixtures with known samples — header fields AND the exact
    // integer sample sum replicate in the oracle, so a hash match proves
    // the codec parsed the container and read every frame
    "mm_decode_audio" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 100)
      val media = Multimodal.wavFixtures(docs, batchSize = 32)
      Multimodal.decodeAudioReal(media, "payload", batchSize = 32)
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("sum_samples"))
    }),

    // real multi-frame decode: animated GIF (the JDK's one multi-frame
    // format) — frame count, sampled frame indexes, and exact per-frame
    // pixel sums all replicate in the oracle's closed-form arithmetic
    "mm_video_frames" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 60)
      val media = Multimodal.gifFixtures(docs, batchSize = 16)
      Multimodal.sampleVideoFrames(media, "payload", stride = 2, batchSize = 16)
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          col("width"), col("height"), col("sum_r"), col("sum_g"), col("sum_b"))
    }),

    // ---- event streams
    // z-order (Morton) coding over exact integer buckets — the
    // multi-column data-skipping layout key; every bit shift replicates
    // in SQL (writeZOrdered's clustering property is ZOrderSpec's)
    "data_zorder" -> ((s, dir) => {
      val e = events(s, dir)
      // integer `div`, never fp division: exact on both engines
      val withUs = e.withColumn("_us", EventStreams.epochMicros(e, "ts"))
      val b1 = pmod(col("user_id"), lit(256L))
      val b2 = pmod(expr("_us div 3600000000"), lit(256L))
      withUs.select(col("event_id"),
        graft.store.ZOrder.zValue(Seq(b1, b2), 8).as("z"))
    }),

    "events_windowed" -> ((s, dir) =>
      roundCols(EventStreams.windowedStats(events(s, dir), 3600L),
        Seq("sum_value"))),

    // sliding (hopping) windows: 1h windows every 15min — each event
    // explodes into its 4 covering windows (bounded, map-side-combined
    // groupBy); assignment arithmetic and every aggregate replicate in
    // SQL via the same generate-4-starts construction
    "events_windowed_sliding" -> ((s, dir) =>
      roundCols(EventStreams.slidingWindowStats(events(s, dir), 3600L, 900L),
        Seq("sum_value"))),

    // Spark's NATIVE session_window gated against an independent
    // lag-based islands construction (>= gap boundary, end = last+gap):
    // pins the engine's merge semantics, not our reimplementation
    "events_session_window" -> ((s, dir) =>
      roundCols(EventStreams.sessionWindowStats(events(s, dir), 1800L),
        Seq("session_value"))),

    "events_sessionize" -> ((s, dir) => {
      val sess = EventStreams.sessionize(events(s, dir), gapSeconds = 1800L)
      sess.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events_total"),
          max(col("n_events")).as("max_session_events"))
    }),

    // event-sequence funnel: greedy-earliest view -> click -> purchase
    // chain per user, horizon 3 days anchored at the first view; the
    // single-shuffle sorted-fold result must equal the oracle's chained
    // min-subquery construction (two independent derivations of the
    // same greedy recurrence)
    "events_funnel_steps" -> ((s, dir) =>
      EventStreams.funnelSteps(events(s, dir),
        Seq("view", "click", "purchase"), horizonSeconds = 259200L)),

    // funnel trend: the same chains bucketed by anchor day —
    // conversion over time
    "events_funnel_trend" -> ((s, dir) =>
      EventStreams.funnelTrend(
        EventStreams.funnelSteps(events(s, dir),
          Seq("view", "click", "purchase"), horizonSeconds = 259200L))),

    "events_funnel_summary" -> ((s, dir) =>
      EventStreams.funnelSummary(
        EventStreams.funnelSteps(events(s, dir),
          Seq("view", "click", "purchase"), horizonSeconds = 259200L),
        Seq("view", "click", "purchase"))),

    // retention triangle: day cohorts by first event, distinct active
    // users per (cohort, day-offset)
    "events_retention_cohorts" -> ((s, dir) =>
      EventStreams.retentionCohorts(events(s, dir), bucketSeconds = 86400L)),

    // trailing rolling features over each user's last 5 events — the
    // lag-feature projection; ROWS frame totalized by (ts, event_id)
    "events_rolling_stats" -> ((s, dir) =>
      roundCols(EventStreams.rollingStats(events(s, dir), k = 5),
        Seq("roll_sum", "roll_avg", "roll_max"))),

    // prior-window z-score anomaly signal (frame excludes the current
    // row so a spike can't mask itself)
    "events_rolling_zscore" -> ((s, dir) =>
      roundCols(EventStreams.rollingZScore(events(s, dir), k = 8),
        Seq("value", "prior_mean", "prior_std", "z"))),

    "events_json_extract" -> ((s, dir) =>
      events(s, dir)
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))),

    // as-of join: each purchase picks up the user's latest prior view —
    // union + one keyed window pass (no range-join explosion); DuckDB's
    // native ASOF JOIN is the oracle
    "events_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("ts_ev"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("ts_ev"),
          col("value").as("view_value"), col("event_id").as("view_event_id"))
      val joined = EventStreams.asofJoin(purchases, views, "user_id", "ts_ev",
        Seq("view_value", "view_event_id"))
      // DuckDB timestamps are microseconds: emit micros for the compare
      // (type-aware — the stored ts has been Long nanos and TIMESTAMP_NTZ
      // across testdata generations)
      joined.withColumn("ts_us", EventStreams.epochMicros(joined, "ts_ev"))
        .drop("ts_ev")
    }),

    // ---- relational / analytical (the 100 TB shapes: scan-agg,
    // broadcast star join, window top-k)
    "agg_pricing_summary" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
      roundCols(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base"),
        discountedSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("cnt")), Seq("avg_qty"))
    }),

    "join_revenue_by_nation" -> ((s, dir) => {
      val cust = Tables.read(s, dir, "customer")
      val ord = Tables.read(s, dir, "orders")
      val li = Tables.read(s, dir, "lineitem")
      val nat = Tables.read(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust.hint("broadcast"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(discountedSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // TPC-H Q3 shape: selective dimension filter -> broadcast ->
    // fact join -> decimal-exact grouped revenue -> top-k
    "join_shipping_priority" -> ((s, dir) => {
      val cust = Tables.read(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.read(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1997-06-01")))
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1997-06-01")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(discountedSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
    }),

    // salted two-phase aggregation: must be EXACTLY the plain GROUP BY
    // (l_quantity is integer-valued, so double sums are order-exact) —
    // the skew path is gate-checked, not just unit-tested
    "skew_salted_agg" -> ((s, dir) =>
      graft.functions.Skew.saltedSum(
        Tables.read(s, dir, "lineitem"), col("l_suppkey"), col("l_quantity"))
        .select(col("key").as("l_suppkey"), col("sum").as("sum_qty"),
          col("cnt").as("cnt"))),

    "window_top_orders" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.read(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    }),

    // ---- store lifecycle (snapshot -> load -> validate)
    // at-rest delete: write a fresh cell-partitioned layout, delete ids
    // through the bounded per-directory rewrite, read back — the stored
    // state must be the corpus minus exactly those ids (right-to-be-
    // forgotten end-to-end; the facade's deleteIndexed serves this path)
    "store_delete_rewrite" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val cents = IvfIndex.trainOrdered(coll, config,
        IvfIndex.IvfConfig(k = 8, iterations = 5), col("id").cast("long"))
      val path = java.nio.file.Files.createTempDirectory("graft_del_gate")
        .toString
      IvfIndex.writePartitioned(coll.drop("metadata"), cents, path)
      val n = graft.store.Compaction.deleteIds(s, path,
        Seq("1", "3", "7", "no_such_id"))
      s.read.parquet(path).select(col("id"))
        .withColumn("deleted", lit(n)).orderBy("id")
    }),

    "store_roundtrip" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val path = "/tmp/graft_snapshot_roundtrip"
      graft.store.CollectionStore.snapshot(coll, config, path)
      val (loaded, cfg) = graft.store.CollectionStore.load(s, path,
        overrides = Map("name" -> "reloaded", "score" -> "similarity"))
      loaded.agg(count(lit(1)).as("cnt")).select(
        col("cnt"), lit(cfg.dimensions).as("dimensions"),
        lit(cfg.metric.name).as("metric"),
        lit(cfg.effectiveNormalize.name).as("normalize"),
        lit(cfg.name).as("name"), lit(cfg.score.name).as("score"))
    })
  )

  // ======================================================== oracle SQL

  private val tokensSql = "string_split_regex(trim(text), '\\s+')"

  /** DSIR chain: lowercased uni+bigram hash buckets per doc, target/raw
    * bucket counts (target = the English slice of `src`; raw = the rows
    * of `src` matching `fitPred` — TRUE for fit-on-everything, a hash
    * predicate for the fit/score-separated pipeline form), the
    * add-1-smoothed per-bucket log ratio over the full 512-bucket
    * domain, and per-doc summed log weights over ALL of `src` —
    * mirrors graft.text.Dsir bit for bit (the md5 bucket idiom is
    * Sampling.hashBucket with salt 'dsir'). */
  private def dsirCtesOver(src: String, fitPred: String): String =
    s"""dt AS (SELECT doc_id, lang,
         list_filter(list_transform(string_split_regex(trim(text), '\\s+'), w -> lower(w)),
                     w -> len(w) > 0) AS toks FROM $src),
       dg AS (SELECT doc_id, lang, list_concat(toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(0, len(toks) - 1), i -> array_to_string(toks[i+1:i+2], ' '))
                ELSE [] END) AS grams FROM dt),
       db AS (SELECT doc_id, lang,
           list_transform(grams, g -> CAST(('0x' || substr(md5('dsir' || ':' || g), 1, 8))::BIGINT % 512 AS INT)) AS bks
         FROM dg),
       de AS (SELECT doc_id, lang, u.b AS bucket FROM db, unnest(bks) AS u(b)),
       dtc AS (SELECT bucket, count(*) AS n FROM de WHERE lang = 'en' GROUP BY 1),
       drc AS (SELECT bucket, count(*) AS n FROM de WHERE $fitPred GROUP BY 1),
       dtot AS (SELECT (SELECT coalesce(sum(n), 0) FROM dtc) AS tt,
                       (SELECT coalesce(sum(n), 0) FROM drc) AS tr),
       dratio AS (SELECT r.range AS bucket,
           ln((coalesce(dtc.n, 0) + 1.0) / (dtot.tt + 512.0))
             - ln((coalesce(drc.n, 0) + 1.0) / (dtot.tr + 512.0)) AS lr
         FROM range(0, 512) r CROSS JOIN dtot
           LEFT JOIN dtc ON dtc.bucket = r.range
           LEFT JOIN drc ON drc.bucket = r.range),
       dw AS (SELECT de.doc_id, sum(dratio.lr) AS lw
         FROM de JOIN dratio ON dratio.bucket = de.bucket GROUP BY 1),
       dsirw AS (SELECT d.doc_id, coalesce(dw.lw, 0.0) AS lw
         FROM $src d LEFT JOIN dw ON dw.doc_id = d.doc_id)"""

  private val dsirCtes = dsirCtesOver("documents", "TRUE")

  /** The md5 per-mille hash-sample predicate of
    * [[graft.functions.Sampling.sampleByHash]] (salt `graft`). */
  private def hashSamplePred(perMille: Int): String =
    s"('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 < $perMille"
  private def shinglesSql(k: Int): String =
    s"list_transform(range(0, greatest(len(toks)-$k,0)+1), i -> array_to_string(toks[i+1:i+$k], ' '))"
  private val enList = TextAnalysis.profiles.toMap.apply("en").map("'" + _ + "'").mkString(",")

  private def langCount(lang: String): String = {
    val words = TextAnalysis.profiles.toMap.apply(lang).map("'" + _ + "'").mkString(",")
    s"len(list_filter(toks, t -> t IN ($words)))"
  }

  private val simhashSql =
    """bits AS (SELECT id, b,
         SUM(CASE WHEN ((strpos('0123456789abcdef', substr(md5(tok), b//4 + 1, 1)) - 1) >> (3 - b%4)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         FROM toks, range(0, 64) r(b) GROUP BY id, b),
       words AS (SELECT id, list_sum(list_transform(list_sort(list_zip(list(b), list(vote))),
         z -> CASE WHEN z[2] >= 0 THEN 1::HUGEINT << (63 - z[1]) ELSE 0::HUGEINT END)) AS w
         FROM bits GROUP BY id),
       sh AS (SELECT id, CAST(CASE WHEN w >= (1::HUGEINT << 63) THEN w - (1::HUGEINT << 64) ELSE w END AS BIGINT) AS simhash FROM words)"""

  private def minhashSigSql(numHashes: Int): String =
    "[" + (0 until numHashes).map(i =>
      s"list_min(list_transform(sh, s -> md5('$i:' || s)))").mkString(", ") + "]"

  private def minhashBandsSql(bands: Int, rows: Int): String =
    "[" + (0 until bands).map { b =>
      val parts = (0 until rows).map(r => s"sig[${b * rows + r + 1}]").mkString(" || '|' || ")
      s"md5('$b:' || $parts)"
    }.mkString(", ") + "]"

  /** Exact flat cosine top-10, optionally over a filtered corpus: the
    * predicate restricts STORED rows only (the query vector CTE stays
    * unfiltered), mirroring the post-filter semantics of the filtered
    * search APIs. */
  private def flatCosineOracleWhere(where: String): String =
    s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS qv FROM embeddings WHERE vec_id = 0),
       n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings $where),
       sc AS (SELECT id, list_sum(list_transform(range(1, len(nv)+1), i -> CAST(nv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS raw FROM n, q)
       SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric, id AS value
       FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10"""

  private val flatCosineOracle = flatCosineOracleWhere("")

  /** (x * c) mod 2^64 over HUGEINT via 32-bit lo/hi split — the direct
    * product can exceed INT128. */
  private def sqlMul64(x: String, c: BigInt): String = {
    val cl = c % (BigInt(1) << 32)
    val ch = c >> 32
    s"""((($x) % 4294967296) * $cl::HUGEINT
       + (((($x) % 4294967296) * $ch::HUGEINT
       + (($x) >> 32) * $cl::HUGEINT) % 4294967296) * 4294967296)
       % (1::HUGEINT << 64)"""
  }

  /** Bit-exact SQL mirror of CosineLsh: SplitMix-derived hyperplane
    * weights (u64 arithmetic in HUGEINT), per-plane dots in dim order,
    * MSB-first band signatures, band-collision candidates, exact rerank.
    * bands=24, bitsPerBand=6, seed=42 — the gate query's config. */
  /** Shared CTE prefix: SplitMix weights + per-id band keys over the
    * normalized embeddings (id expression parameterized). */
  private def lshPrefix(idExpr: String): String = {
    val c1 = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
    val c2 = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
    val c3 = BigInt("10723151780598845931") // 0x94D049BB133111EB
    s"""dd AS (SELECT max(len(embedding)) AS dims FROM embeddings),
       planes AS (SELECT unnest(range(0, 144)) AS p),
       ds AS (SELECT unnest(range(0, (SELECT dims FROM dd))) AS d),
       w0 AS (SELECT p, d,
           (xor(xor(42::HUGEINT, (p::HUGEINT << 17)), (d::HUGEINT << 31))
            + $c1::HUGEINT) % (1::HUGEINT << 64) AS x1
         FROM planes, ds),
       w2 AS (SELECT p, d, ${sqlMul64("xor(x1, x1 >> 30)", c2)} AS x2 FROM w0),
       w3 AS (SELECT p, d, ${sqlMul64("xor(x2, x2 >> 27)", c3)} AS x3 FROM w2),
       weights AS (SELECT p, d,
           (CAST(xor(x3, x3 >> 31) >> 11 AS DOUBLE) / 9007199254740992.0) * 2.0 - 1.0 AS w
         FROM w3),
       n AS (SELECT $idExpr AS id,
           list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv
         FROM embeddings),
       vd AS (SELECT id, p, list_sum(list_transform(range(0, (SELECT dims FROM dd)),
               d -> CAST(nv[d+1] AS DOUBLE) * ww[d+1])) AS pdot
         FROM n JOIN (SELECT p, list(w ORDER BY d) AS ww FROM weights GROUP BY p) pw ON true),
       keys AS (SELECT id, (p // 6) AS band,
           bit_or((CASE WHEN pdot >= 0 THEN 1 ELSE 0 END) << (5 - (p % 6))) AS sig
         FROM vd GROUP BY id, (p // 6)),
       bandkeys AS (SELECT id, ((band << 6) | sig) AS key FROM keys)"""
  }

  /** Multi-probe query keys: the gate config probes probeBits=6 of 6
    * bits at probeOrder=2, i.e. EVERY signature within Hamming distance
    * <= 2 per band (margin ranking is moot when all bits are probed —
    * the margin-directed subset only binds when probeBits < bitsPerBand,
    * covered by ScalaTest). The oracle enumerates the radius-2 ball. */
  private val lshOracle =
    s"""WITH ${lshPrefix("CAST(vec_id AS VARCHAR)")},
       qk AS (SELECT DISTINCT ((k.band << 6) | s.s) AS key
         FROM keys k, (SELECT unnest(range(0, 64)) AS s) s
         WHERE k.id = '0' AND bit_count(CAST(xor(s.s::BIGINT, k.sig::BIGINT) AS BIGINT)) <= 2),
       cands AS (SELECT DISTINCT b.id FROM bandkeys b JOIN qk ON b.key = qk.key),
       q AS (SELECT list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS qv
         FROM embeddings WHERE vec_id = 0),
       sc AS (SELECT n.id,
           list_sum(list_transform(range(1, len(nv)+1), i -> CAST(nv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS raw
         FROM n JOIN cands USING (id), q)
       SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance,
         'cosine' AS metric, id AS value
       FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10"""

  /** All-pairs LSH near-dup oracle: ids colliding in any band, cosine
    * verified at the gate threshold. */
  private val embeddingLshOracle =
    s"""WITH ${lshPrefix("vec_id")},
       cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bandkeys a JOIN bandkeys b ON a.key = b.key AND a.id < b.id),
       ver AS (SELECT id_a, id_b,
           list_sum(list_transform(range(1, len(na.nv)+1), i -> CAST(na.nv[i] AS DOUBLE) * CAST(nb.nv[i] AS DOUBLE))) AS cosine
         FROM cand JOIN n na ON na.id = cand.id_a JOIN n nb ON nb.id = cand.id_b)
       SELECT id_a, id_b, (round(cosine, 6) + 0) AS cosine
       FROM ver WHERE cosine >= 0.3 ORDER BY id_a, id_b"""

  /** Two-sided (batch-vs-corpus) variant of [[embeddingLshOracle]]: the
    * shared prefix computes normalized vectors and band keys over ALL
    * embeddings (hyperplanes are data-independent), the candidate join
    * then splits sides by id instead of ordering a<b. */
  private val embeddingAgainstOracle =
    s"""WITH ${lshPrefix("vec_id")},
       cand AS (SELECT DISTINCT b.id AS id, c.id AS corpus_id
         FROM bandkeys b JOIN bandkeys c ON b.key = c.key
         WHERE b.id >= 400 AND c.id < 400),
       ver AS (SELECT cand.id, cand.corpus_id,
           list_sum(list_transform(range(1, len(na.nv)+1), i -> CAST(na.nv[i] AS DOUBLE) * CAST(nb.nv[i] AS DOUBLE))) AS cosine
         FROM cand JOIN n na ON na.id = cand.id JOIN n nb ON nb.id = cand.corpus_id)
       SELECT id, corpus_id, (round(cosine, 6) + 0) AS cosine
       FROM ver WHERE cosine >= 0.3 ORDER BY id, corpus_id"""

  /** Partial-probe IVF oracle: full Lloyd's k-means (k=8, 5 iterations,
    * id-ordered sample, first-min assignment ties, empty-cell re-seed)
    * as a recursive CTE — centroids are 8 LATERAL aggregates per
    * iteration; each lateral re-exposes the recursive centroid column
    * through a one-row derived table so lambdas can reference it (DuckDB
    * forbids correlated columns inside lambda bodies). Then the query's
    * 2 nearest cells, exact cosine rerank inside — the approximate
    * candidate set verified end-to-end. */
  // dims via len() of in-scope lists, never a subquery: these
  // expressions nest inside lambdas, where DuckDB forbids subqueries
  private def ivfL2(a: String, b: String) =
    s"list_sum(list_transform(range(0, len($a)), i -> (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE)) * (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE))))"
  private def ivfAssign(vv: String, cc: String) =
    s"(list_position(list_transform(range(1, 9), k -> ${ivfL2(vv, s"$cc[k]")}), list_min(list_transform(range(1, 9), k -> ${ivfL2(vv, s"$cc[k]")}))) - 1)"

  /** The shared k=8/it=5 recursive-CTE Lloyd's chain replicating
    * IvfIndex.trainOrdered on the cosine-normalized embeddings table:
    * provides CTEs `n` (id, vec_id, nv), `sample`, `meta`, `init`,
    * `km`, and `cents` — callers append their own tail after it inside
    * a WITH RECURSIVE. */
  private val ivfCosKmeansCtes: String = {
    val laterals = (0 until 8).map(k =>
      s"LATERAL (SELECT count(*) AS cn, list(s.nv ORDER BY s.pos) AS ml" +
      s" FROM sample s, (SELECT km.c AS cc) t WHERE ${ivfAssign("s.nv", "t.cc")} = $k) m$k")
      .mkString(",\n    ")
    val cents = (0 until 8).map(k =>
      s"""CASE WHEN m$k.cn = 0
      THEN (SELECT s2.nv FROM sample s2 WHERE s2.pos = (($k * 7919) % (SELECT cnt FROM meta)) + 1)
      ELSE list_transform(range(0, len(m$k.ml[1])), d -> CAST(list_sum(list_transform(m$k.ml, m -> CAST(m[d+1] AS DOUBLE))) / m$k.cn AS FLOAT))
      END""").mkString(",\n      ")
    val nrm = "list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT))"
    s"""n AS (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, $nrm AS nv FROM embeddings),
       sample AS (SELECT nv, row_number() OVER (ORDER BY vec_id) AS pos FROM n),
       meta AS (SELECT count(*)::BIGINT AS cnt FROM sample),
       init AS (SELECT list(s.nv ORDER BY i.i) AS c
         FROM (SELECT unnest(range(0, 8)) AS i) i
         JOIN sample s ON s.pos = (i.i * (SELECT cnt FROM meta)) // 8 + 1),
       km(it, c) AS (
         SELECT 0, c FROM init
         UNION ALL
         SELECT km.it + 1, [$cents]
         FROM km,
           $laterals
         WHERE km.it < 5),
       cents AS (SELECT c FROM km WHERE it = 5)"""
  }

  private def ivfProbeOracle(probesCte: String): String = {
    def l2(a: String, b: String) = ivfL2(a, b)
    def assign(vv: String, cc: String) = ivfAssign(vv, cc)
    s"""WITH RECURSIVE
       $ivfCosKmeansCtes,
       q AS (SELECT nv AS qv FROM n WHERE vec_id = 0),
       celld AS (SELECT k - 1 AS cell, ${l2("qv", "cents.c[k]")} AS d2
         FROM (SELECT unnest(range(1, 9)) AS k), cents, q),
       probes AS ($probesCte),
       cands AS (SELECT n.id, n.nv FROM n, cents
         WHERE ${assign("n.nv", "cents.c")} IN (SELECT cell FROM probes)),
       sc AS (SELECT id, list_sum(list_transform(range(1, len(nv) + 1),
           i -> CAST(nv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS raw FROM cands, q)
       SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance,
         'cosine' AS metric, id AS value
       FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10"""
  }

  private val ivfPartialProbeOracle =
    ivfProbeOracle("SELECT cell FROM celld ORDER BY d2 ASC, cell ASC LIMIT 2")

  /** Adaptive probe rule (IvfIndex.probeCellsAdaptive): every cell
    * within ratio x the nearest cell's squared distance, ties by
    * ascending cell, capped at maxProbe — same IEEE double arithmetic
    * as the Scala side (cutoff = d2min * ratio). */
  private val ivfAdaptiveProbeOracle =
    ivfProbeOracle("""SELECT cell FROM celld
         WHERE d2 <= (SELECT min(d2) FROM celld) * 1.2
         ORDER BY d2 ASC, cell ASC LIMIT 4""")

  /** SQ8: per-dim min/max aggregates -> affine codes -> ADC (against the
    * f64 reconstruction) -> exact rerank; every f32/f64 step mirrors the
    * engine (Sq8.encodeVec / Sq8.adcTable), so the approximate candidate
    * set is bit-exact, not just the reranked output. */
  private val sq8Oracle = {
    def l2sq(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a)+1), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"
    val code = "LEAST(255, GREATEST(0, round(CAST(CAST(e.embedding[i+1] - m.mn[i+1] AS FLOAT) AS DOUBLE) * 255.0 / CAST(m.rng[i+1] AS DOUBLE))))"
    val recon = s"(CAST(m.mn[i+1] AS DOUBLE) + $code * CAST(m.rng[i+1] AS DOUBLE) / 255.0)"
    s"""WITH dgrid AS (SELECT unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS d),
       stats AS (SELECT g.d, min(e.embedding[g.d+1]) AS mn, max(e.embedding[g.d+1]) AS mx
                 FROM embeddings e, dgrid g GROUP BY g.d),
       model AS (SELECT list(mn ORDER BY d) AS mn, list(CAST(mx - mn AS FLOAT) ORDER BY d) AS rng FROM stats),
       q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       adc AS (SELECT CAST(e.vec_id AS VARCHAR) AS id, e.embedding AS v,
           list_sum(list_transform(range(0, len(e.embedding)), i ->
             CASE WHEN m.rng[i+1] = 0 THEN
               (CAST(q.qraw[i+1] AS DOUBLE) - CAST(m.mn[i+1] AS DOUBLE)) * (CAST(q.qraw[i+1] AS DOUBLE) - CAST(m.mn[i+1] AS DOUBLE))
             ELSE
               (CAST(q.qraw[i+1] AS DOUBLE) - $recon) * (CAST(q.qraw[i+1] AS DOUBLE) - $recon)
             END)) AS approx
         FROM embeddings e, model m, q),
       cand AS (SELECT id, v FROM adc ORDER BY approx ASC, id ASC LIMIT 50),
       fin AS (SELECT id, sqrt(${l2sq("v", "qraw")}) AS raw FROM cand, q)
       SELECT id, id AS value, (round(-raw,6)+0) AS score, (round(raw,6)+0) AS distance, 'l2' AS metric
       FROM fin ORDER BY raw ASC, id ASC LIMIT 10"""
  }

  // ---- shared SQL builders for the k-means-based quantizer oracles
  // (dims via len() of in-scope lists, never a subquery: these nest
  // inside lambdas, where DuckDB forbids subqueries)

  private def kmL2(a: String, b: String) =
    s"list_sum(list_transform(range(0, len($a)), i -> (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE)) * (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE))))"

  /** First-min argmin over 8 centroids (mirrors nearestCentroid). */
  private def kmAssign(vv: String, cc: String) =
    s"(list_position(list_transform(range(1, 9), k -> ${kmL2(vv, s"$cc[k]")}), list_min(list_transform(range(1, 9), k -> ${kmL2(vv, s"$cc[k]")}))) - 1)"

  /** PQ per-subspace Lloyd's as FOUR parallel rows of one recursive CTE
    * (state keyed by `sub`, laterals correlated on `km.sub`). Samples
    * `src(vec_id, v)`; yields CTEs through `cb(sub, c)`. Hot inputs are
    * MATERIALIZED — DuckDB inlines CTEs by default, and each k-means
    * lateral would otherwise recompute the whole upstream chain. */
  private def pqKmeansCtes(src: String) = {
    val laterals = (0 until 8).map(k =>
      s"LATERAL (SELECT count(*) AS cn, list(s.sv ORDER BY s.pos) AS ml" +
      s" FROM ss s, (SELECT km.c AS cc, km.sub AS sj) t" +
      s" WHERE s.sub = t.sj AND ${kmAssign("s.sv", "t.cc")} = $k) m$k")
      .mkString(",\n    ")
    val cents = (0 until 8).map(k =>
      s"""CASE WHEN m$k.cn = 0
      THEN (SELECT s2.sv FROM ss s2, (SELECT km.sub AS sj2) t2 WHERE s2.sub = t2.sj2 AND s2.pos = (($k * 7919) % (SELECT cnt FROM meta)) + 1)
      ELSE list_transform(range(0, len(m$k.ml[1])), d -> CAST(list_sum(list_transform(m$k.ml, m -> CAST(m[d+1] AS DOUBLE))) / m$k.cn AS FLOAT))
      END""").mkString(",\n      ")
    s"""sample AS MATERIALIZED (SELECT v, pos FROM (SELECT v, row_number() OVER (ORDER BY vec_id) AS pos FROM $src) WHERE pos <= 256),
       meta AS (SELECT count(*)::BIGINT AS cnt FROM sample),
       ss AS MATERIALIZED (SELECT sub.s AS sub, s.pos,
              s.v[(sub.s*(len(s.v)//4)+1):((sub.s+1)*(len(s.v)//4))] AS sv
            FROM sample s, (SELECT unnest(range(0,4)) AS s) sub),
       init AS (SELECT ss.sub, list(ss.sv ORDER BY i.i) AS c
            FROM (SELECT unnest(range(0,8)) AS i) i
            JOIN ss ON ss.pos = (i.i * (SELECT cnt FROM meta)) // 8 + 1
            GROUP BY ss.sub),
       km(sub, it, c) AS (
         SELECT sub, 0, c FROM init
         UNION ALL
         SELECT km.sub, km.it + 1, [$cents]
         FROM km,
           $laterals
         WHERE km.it < 3),
       cb AS (SELECT sub, c FROM km WHERE it = 3)"""
  }

  /** PQ encode + ADC + exact-rerank tail over a candidate source CTE
    * (`src(id, v)`): per-slice argmin codes, ordered per-subspace sum —
    * mirrors Pq.encodeVec / Pq.adcTable / Search.rerankExact. */
  private def pqAdcTail(src: String) = {
    val sliceN = "n.v[(qs.sub*(len(n.v)//4)+1):((qs.sub+1)*(len(n.v)//4))]"
    s"""qs AS (SELECT cb.sub, q.qraw[(cb.sub*(len(q.qraw)//4)+1):((cb.sub+1)*(len(q.qraw)//4))] AS qsv, cb.c FROM cb, q),
       rowsub AS (SELECT n.id, qs.sub, qs.qsv, qs.c,
           ${kmAssign(sliceN, "qs.c")} AS code
         FROM $src n, qs),
       adc AS (SELECT r.id, list_sum(list(${kmL2("r.qsv", "r.c[r.code+1]")} ORDER BY r.sub)) AS approx
          FROM rowsub r GROUP BY r.id),
       cand AS (SELECT a.id, n.v FROM adc a JOIN $src n ON n.id = a.id ORDER BY a.approx ASC, a.id ASC LIMIT 50),
       fin AS (SELECT id, sqrt(${kmL2("v", "qraw")}) AS raw FROM cand, q)
       SELECT id, id AS value, (round(-raw,6)+0) AS score, (round(raw,6)+0) AS distance, 'l2' AS metric
       FROM fin ORDER BY raw ASC, id ASC LIMIT 10"""
  }

  private def kmDot(a: String, b: String) =
    s"list_sum(list_transform(range(0, len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))"

  /** Cosine variant of the ADC tail: codes are still L2 argmin (mirrors
    * Pq.encodeVec, which is metric-independent), but the ADC partial is
    * the per-subspace DOT and candidates order by approx DESC (the engine
    * ranks similarity as -approx). Rerank = dot on the (already unit)
    * vectors. */
  private def pqAdcCosTail(src: String) = {
    val sliceN = "n.v[(qs.sub*(len(n.v)//4)+1):((qs.sub+1)*(len(n.v)//4))]"
    s"""qs AS (SELECT cb.sub, q.qraw[(cb.sub*(len(q.qraw)//4)+1):((cb.sub+1)*(len(q.qraw)//4))] AS qsv, cb.c FROM cb, q),
       rowsub AS (SELECT n.id, qs.sub, qs.qsv, qs.c,
           ${kmAssign(sliceN, "qs.c")} AS code
         FROM $src n, qs),
       adc AS (SELECT r.id, list_sum(list(${kmDot("r.qsv", "r.c[r.code+1]")} ORDER BY r.sub)) AS approx
          FROM rowsub r GROUP BY r.id),
       cand AS (SELECT a.id, n.v FROM adc a JOIN $src n ON n.id = a.id ORDER BY a.approx DESC, a.id ASC LIMIT 50),
       fin AS (SELECT id, ${kmDot("v", "qraw")} AS raw FROM cand, q)
       SELECT id, id AS value, (round(raw,6)+0) AS score, (round(1.0 - raw,6)+0) AS distance, 'cosine' AS metric
       FROM fin ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10"""
  }

  /** RaBitQ sign stream (seed 7, round 0 == Opq.signs(d, 7)) as a list
    * CTE — shared by the three rabitq gate rows. */
  private val rabitqSignCtes = {
    val c1 = BigInt("11400714819323198485")
    val c2 = BigInt("13787848793156543929")
    val c3 = BigInt("10723151780598845931")
    s"""sgd AS (SELECT unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS j),
       sg0 AS (SELECT j, (7::HUGEINT + (j::HUGEINT + 1) * $c1::HUGEINT) % (1::HUGEINT << 64) AS st FROM sgd),
       sg1 AS (SELECT j, ${sqlMul64("xor(st, st >> 30)", c2)} AS z1 FROM sg0),
       sg2 AS (SELECT j, ${sqlMul64("xor(z1, z1 >> 27)", c3)} AS z2 FROM sg1),
       sgl AS (SELECT list(CASE WHEN xor(z2, z2 >> 31) % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY j) AS sgn FROM sg2)"""
  }

  /** f64 sign-Hadamard rotation (NO f32 casts — RaBitQ keeps the whole
    * estimator pipeline in doubles): term-for-term
    * RaBitQ.rotateOrdered's ascending-j accumulation. */
  private def rabitqRotD(src: String) =
    s"""list_transform(range(0, len($src)), i ->
       list_sum(list_transform(range(0, len($src)), j ->
         (CASE WHEN bit_count(CAST(i & j AS BIGINT)) % 2 = 0 THEN 1.0 ELSE -1.0 END)
         * sgn[j+1] * CAST($src[j+1] AS DOUBLE))) / sqrt(len($src)))"""

  /** Corpus-side rotate + factor CTEs (`rqe(id, v, r, rnorm, sabs)`)
    * mirroring RaBitQ.encodeVec on the uncentered gate model. */
  private val rabitqEncCtes =
    s"""rq AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v,
         ${rabitqRotD("embedding")} AS r FROM embeddings, sgl),
       rqe AS MATERIALIZED (SELECT id, v, r,
         sqrt(list_sum(list_transform(r, x -> x * x))) AS rnorm,
         list_sum(list_transform(r, x -> abs(x))) AS sabs FROM rq)"""

  /** est-L2^2 estimator expression over `rqe` columns + a prepared
    * query (`nqr`, `qhat`) — the mode-0 arithmetic of RaBitQ.rankBits,
    * operation-for-operation. */
  private val rabitqEst =
    """nqr*nqr + rnorm*rnorm - 2.0*(nqr * rnorm *
       (CASE WHEN sabs = 0.0 THEN 0.0 ELSE sdot * rnorm / sabs END))"""

  /** Encode + estimator gate: packed word 0 (exact signed i64), both
    * factors, estimated L2^2 vs query 0 for ids < 64. */
  private val rabitqEstimatorOracle =
    s"""WITH $rabitqSignCtes,
       $rabitqEncCtes,
       q0 AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       qr AS (SELECT ${rabitqRotD("qraw")} AS r FROM q0, sgl),
       qn AS (SELECT r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nqr FROM qr),
       qh AS (SELECT nqr, CASE WHEN nqr > 0.0 THEN list_transform(r, x -> x / nqr)
         ELSE list_transform(r, x -> 0.0) END AS qhat FROM qn),
       sc AS (SELECT e.id, e.rnorm, e.sabs, q.nqr,
           list_sum(list_transform(range(0, LEAST(len(e.r), 64)), i ->
             CASE WHEN e.r[i+1] >= 0.0 THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)) AS w0,
           list_sum(list_transform(range(0, len(e.r)), i ->
             CASE WHEN e.r[i+1] >= 0.0 THEN q.qhat[i+1] ELSE -q.qhat[i+1] END)) AS sdot
         FROM rqe e, qh q WHERE CAST(e.id AS BIGINT) < 64)
       SELECT id,
         CAST(w0 - (CASE WHEN w0 >= (1::HUGEINT << 63) THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END) AS BIGINT) AS word0,
         (round(rnorm, 6) + 0) AS rnorm, (round(sabs, 6) + 0) AS sabs,
         (round($rabitqEst, 6) + 0) AS est_l2sq
       FROM sc"""

  /** Estimated-L2 candidate cut (50) + exact L2 rerank (10) — the
    * single-query rabitq search, candidate set verified. */
  private val rabitqOracle =
    s"""WITH $rabitqSignCtes,
       $rabitqEncCtes,
       q0 AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       qr AS (SELECT qraw, ${rabitqRotD("qraw")} AS r FROM q0, sgl),
       qn AS (SELECT qraw, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nqr FROM qr),
       qh AS (SELECT qraw, nqr, CASE WHEN nqr > 0.0 THEN list_transform(r, x -> x / nqr)
         ELSE list_transform(r, x -> 0.0) END AS qhat FROM qn),
       sc AS (SELECT e.id, e.v, e.rnorm, e.sabs, q.nqr,
           list_sum(list_transform(range(0, len(e.r)), i ->
             CASE WHEN e.r[i+1] >= 0.0 THEN q.qhat[i+1] ELSE -q.qhat[i+1] END)) AS sdot
         FROM rqe e, qh q),
       est AS (SELECT id, v, $rabitqEst AS approx FROM sc),
       cand AS (SELECT id, v FROM est ORDER BY approx ASC, id ASC LIMIT 50),
       fin AS (SELECT id, sqrt(${kmL2("v", "qraw")}) AS raw FROM cand, qh)
       SELECT id, id AS value, (round(-raw, 6) + 0) AS score,
         (round(raw, 6) + 0) AS distance, 'l2' AS metric
       FROM fin ORDER BY raw ASC, id ASC LIMIT 10"""

  /** Batch rabitq: every global cut re-keyed as a per-qid window —
    * mirrors RaBitQ.searchMany's WindowGroupLimit plan. */
  private val rabitqSearchManyOracle =
    s"""WITH $rabitqSignCtes,
       $rabitqEncCtes,
       qm AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qraw
         FROM embeddings WHERE vec_id < 4),
       qr AS (SELECT qid, qraw, ${rabitqRotD("qraw")} AS r FROM qm, sgl),
       qn AS (SELECT qid, qraw, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nqr FROM qr),
       qh AS (SELECT qid, qraw, nqr, CASE WHEN nqr > 0.0 THEN list_transform(r, x -> x / nqr)
         ELSE list_transform(r, x -> 0.0) END AS qhat FROM qn),
       sc AS (SELECT q.qid, e.id, e.rnorm, e.sabs, q.nqr,
           list_sum(list_transform(range(0, len(e.r)), i ->
             CASE WHEN e.r[i+1] >= 0.0 THEN q.qhat[i+1] ELSE -q.qhat[i+1] END)) AS sdot
         FROM rqe e, qh q),
       est AS (SELECT qid, id, $rabitqEst AS approx FROM sc),
       cand AS (SELECT qid, id FROM (SELECT qid, id,
           row_number() OVER (PARTITION BY qid ORDER BY approx ASC, id ASC) AS rn
         FROM est) WHERE rn <= 50),
       fin AS (SELECT c.qid, c.id, sqrt(${kmL2("n.v", "q.qraw")}) AS raw
         FROM cand c JOIN rqe n ON n.id = c.id JOIN qh q ON q.qid = c.qid)
       SELECT qid, id, id AS value, (round(-raw, 6) + 0) AS score,
         (round(raw, 6) + 0) AS distance, 'l2' AS metric
       FROM (SELECT qid, id, raw,
           row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn
         FROM fin) WHERE rn <= 5"""

  /** OPQ-rotated cosine PQ: SplitMix signs (u64 over HUGEINT, mirrors
    * Opq.signs), Hadamard terms (-1)^popcount(i&j), f64 ascending-j
    * accumulation, /sqrt(d), f32 cast — term-for-term Opq.rotate — then
    * the standard PQ k-means + cosine ADC tail in rotated space
    * (orthonormal, so cosine is preserved). */
  private val opqOracle = {
    val c1 = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
    val c2 = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
    val c3 = BigInt("10723151780598845931") // 0x94D049BB133111EB
    val nrmE = "list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT))"
    def rotE(src: String) =
      s"""list_transform(range(0, len($src)), i ->
         CAST(list_sum(list_transform(range(0, len($src)), j ->
           (CASE WHEN bit_count(CAST(i & j AS BIGINT)) % 2 = 0 THEN 1.0 ELSE -1.0 END)
           * sgn[j+1] * CAST($src[j+1] AS DOUBLE))) / sqrt(len($src)) AS FLOAT))"""
    s"""WITH RECURSIVE
       sgd AS (SELECT unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS j),
       sg0 AS (SELECT j, (7::HUGEINT + (j::HUGEINT + 1) * $c1::HUGEINT) % (1::HUGEINT << 64) AS st FROM sgd),
       sg1 AS (SELECT j, ${sqlMul64("xor(st, st >> 30)", c2)} AS z1 FROM sg0),
       sg2 AS (SELECT j, ${sqlMul64("xor(z1, z1 >> 27)", c3)} AS z2 FROM sg1),
       sgl AS (SELECT list(CASE WHEN xor(z2, z2 >> 31) % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY j) AS sgn FROM sg2),
       nn AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, $nrmE AS nv FROM embeddings),
       n AS MATERIALIZED (SELECT id, vec_id, ${rotE("nv")} AS v FROM nn, sgl),
       ${pqKmeansCtes("n")},
       q0 AS (SELECT $nrmE AS nv FROM embeddings WHERE vec_id = 0),
       q AS (SELECT ${rotE("nv")} AS qraw FROM q0, sgl),
       ${pqAdcCosTail("n")}"""
  }

  /** PQ (m=4, k=8, 3 iterations, 256-sample): candidate set verified
    * end-to-end — mirrors Pq.trainOrdered / Pq.adcTable exactly. */
  private val pqOracle =
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       ${pqKmeansCtes("n")},
       q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       ${pqAdcTail("n")}"""

  /** IVF-PQ: coarse k-means (raw vectors, k=8, 3 iterations, id-ordered
    * 10000-sample — mirrors IvfIndex.trainOrdered) prunes to the nprobe=2
    * nearest cells, then the PQ ADC + rerank tail runs inside the
    * surviving cells only. Both k-means run as recursive CTEs in ONE
    * query, so cells, probe set, codes, and candidates all replicate. */
  /** Coarse-quantizer CTE block: raw vectors `n` -> `icb(c)` (k=8,
    * 3 iterations, id-ordered 10000-sample — mirrors
    * IvfIndex.trainOrdered). */
  private val ivfKmeansCtes = {
    val ivfLaterals = (0 until 8).map(k =>
      s"LATERAL (SELECT count(*) AS cn, list(s.v ORDER BY s.pos) AS ml" +
      s" FROM ivfsample s, (SELECT ivfkm.c AS cc) t WHERE ${kmAssign("s.v", "t.cc")} = $k) iv$k")
      .mkString(",\n    ")
    val ivfCents = (0 until 8).map(k =>
      s"""CASE WHEN iv$k.cn = 0
      THEN (SELECT s2.v FROM ivfsample s2 WHERE s2.pos = (($k * 7919) % (SELECT cnt FROM ivfmeta)) + 1)
      ELSE list_transform(range(0, len(iv$k.ml[1])), d -> CAST(list_sum(list_transform(iv$k.ml, m -> CAST(m[d+1] AS DOUBLE))) / iv$k.cn AS FLOAT))
      END""").mkString(",\n      ")
    s"""ivfsample AS MATERIALIZED (SELECT v, pos FROM (SELECT v, row_number() OVER (ORDER BY vec_id) AS pos FROM n) WHERE pos <= 10000),
       ivfmeta AS (SELECT count(*)::BIGINT AS cnt FROM ivfsample),
       ivfinit AS (SELECT list(s.v ORDER BY i.i) AS c
            FROM (SELECT unnest(range(0,8)) AS i) i
            JOIN ivfsample s ON s.pos = (i.i * (SELECT cnt FROM ivfmeta)) // 8 + 1),
       ivfkm(it, c) AS (
         SELECT 0, c FROM ivfinit
         UNION ALL
         SELECT ivfkm.it + 1, [$ivfCents]
         FROM ivfkm,
           $ivfLaterals
         WHERE ivfkm.it < 3),
       icb AS MATERIALIZED (SELECT c FROM ivfkm WHERE it = 3)"""
  }

  private val ivfPqOracle =
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       $ivfKmeansCtes,
       ${pqKmeansCtes("n")},
       q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       probes AS (SELECT k - 1 AS cell FROM (SELECT unnest(range(1, 9)) AS k), icb, q
         ORDER BY ${kmL2("qraw", "icb.c[k]")} ASC, k ASC LIMIT 2),
       incell AS (SELECT n.id, n.v FROM n, icb
         WHERE ${kmAssign("n.v", "icb.c")} IN (SELECT cell FROM probes)),
       ${pqAdcTail("incell")}"""

  /** Batch IVF-PQ: same k-means CTEs, but the probe/ADC/rerank tail is
    * keyed by qid — the global ORDER BY ... LIMIT cuts become per-qid
    * row_number windows, mirroring the engine's WindowGroupLimit path
    * (IvfPq.searchMany). */
  private val ivfPqSearchManyOracle = {
    val sliceN = "r.v[(qs.sub*(len(r.v)//4)+1):((qs.sub+1)*(len(r.v)//4))]"
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       $ivfKmeansCtes,
       ${pqKmeansCtes("n")},
       q AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qraw FROM embeddings WHERE vec_id < 4),
       probes AS (SELECT qid, cell FROM (
           SELECT q.qid, k - 1 AS cell,
             row_number() OVER (PARTITION BY q.qid ORDER BY ${kmL2("q.qraw", "icb.c[k]")} ASC, k ASC) AS rn
           FROM (SELECT unnest(range(1, 9)) AS k), icb, q)
         WHERE rn <= 2),
       ncell AS MATERIALIZED (SELECT n.id, n.v, ${kmAssign("n.v", "icb.c")} AS cell FROM n, icb),
       incell AS (SELECT p.qid, nc.id, nc.v FROM ncell nc JOIN probes p ON nc.cell = p.cell),
       qs AS (SELECT q.qid, cb.sub, q.qraw[(cb.sub*(len(q.qraw)//4)+1):((cb.sub+1)*(len(q.qraw)//4))] AS qsv, cb.c FROM cb, q),
       rowsub AS (SELECT r.qid, r.id, qs.sub, qs.qsv, qs.c,
           ${kmAssign(sliceN, "qs.c")} AS code
         FROM incell r JOIN qs ON qs.qid = r.qid),
       adc AS (SELECT r.qid, r.id, list_sum(list(${kmL2("r.qsv", "r.c[r.code+1]")} ORDER BY r.sub)) AS approx
          FROM rowsub r GROUP BY r.qid, r.id),
       cand AS (SELECT qid, id FROM (
           SELECT a.qid, a.id,
             row_number() OVER (PARTITION BY a.qid ORDER BY a.approx ASC, a.id ASC) AS rn
           FROM adc a)
         WHERE rn <= 50),
       fin AS (SELECT c.qid, c.id, sqrt(${kmL2("n.v", "q.qraw")}) AS raw
         FROM cand c JOIN n ON n.id = c.id JOIN q ON q.qid = c.qid),
       rk AS (SELECT qid, id, raw,
           row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn FROM fin)
       SELECT qid, id, id AS value, (round(-raw,6)+0) AS score, (round(raw,6)+0) AS distance, 'l2' AS metric
       FROM rk WHERE rn <= 10"""
  }

  /** Per-cell residual (f64: CAST both sides — term-for-term
    * IvfRaBitQ's rotateResidual input, whose centroid is the f32 cell
    * centroid widened to double). `cellRef` indexes `icb.c`. */
  private def ivfRabitqResid(v: String, cellRef: String) =
    s"""list_transform(range(0, len($v)), d ->
       CAST($v[d+1] AS DOUBLE) - CAST(icb.c[$cellRef+1][d+1] AS DOUBLE))"""

  /** IVF x RaBitQ: coarse k-means cells (ivfKmeansCtes) + per-cell
    * residual sign-Hadamard rotations (rabitqSignCtes — one shared sign
    * stream) + the calibrated mode-0 estimator (rabitqEst; the
    * cross-term shifts cancel for L2, which never uses them) + exact
    * rerank. Candidate set verified end-to-end: cells, probe set,
    * per-cell rotations, factors, estimated cut, rerank. */
  private val ivfRabitqOracle =
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       $ivfKmeansCtes,
       $rabitqSignCtes,
       q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       probes AS (SELECT k - 1 AS cell FROM (SELECT unnest(range(1, 9)) AS k), icb, q
         ORDER BY ${kmL2("qraw", "icb.c[k]")} ASC, k ASC LIMIT 2),
       ncell AS MATERIALIZED (SELECT n.id, n.v, ${kmAssign("n.v", "icb.c")} AS cell FROM n, icb),
       res AS (SELECT i.id, i.v, i.cell, ${ivfRabitqResid("i.v", "i.cell")} AS rv
         FROM ncell i, icb WHERE i.cell IN (SELECT cell FROM probes)),
       enc AS MATERIALIZED (SELECT id, v, cell, ${rabitqRotD("rv")} AS r FROM res, sgl),
       rqe AS (SELECT id, v, cell, r,
         sqrt(list_sum(list_transform(r, x -> x * x))) AS rnorm,
         list_sum(list_transform(r, x -> abs(x))) AS sabs FROM enc),
       qres AS (SELECT p.cell, ${ivfRabitqResid("q.qraw", "p.cell")} AS rv
         FROM probes p, icb, q),
       qrot AS (SELECT cell, ${rabitqRotD("rv")} AS r FROM qres, sgl),
       qn AS (SELECT cell, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nqr FROM qrot),
       qh AS (SELECT cell, nqr, CASE WHEN nqr > 0.0 THEN list_transform(r, x -> x / nqr)
         ELSE list_transform(r, x -> 0.0) END AS qhat FROM qn),
       sc AS (SELECT e.id, e.v, e.rnorm, e.sabs, h.nqr,
           list_sum(list_transform(range(0, len(e.r)), i ->
             CASE WHEN e.r[i+1] >= 0.0 THEN h.qhat[i+1] ELSE -h.qhat[i+1] END)) AS sdot
         FROM rqe e JOIN qh h ON e.cell = h.cell),
       est AS (SELECT id, v, $rabitqEst AS approx FROM sc),
       cand AS (SELECT id, v FROM est ORDER BY approx ASC, id ASC LIMIT 50),
       fin AS (SELECT id, sqrt(${kmL2("v", "qraw")}) AS raw FROM cand, q)
       SELECT id, id AS value, (round(-raw, 6) + 0) AS score,
         (round(raw, 6) + 0) AS distance, 'l2' AS metric
       FROM fin ORDER BY raw ASC, id ASC LIMIT 10"""

  /** Batch IVF x RaBitQ: per-qid probe sets, per-(qid, cell) query
    * rotations, one scored join keyed by cell, per-qid estimated cut +
    * exact rerank windows — mirrors IvfRaBitQ.searchManyPartitioned. */
  private val ivfRabitqSearchManyOracle =
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       $ivfKmeansCtes,
       $rabitqSignCtes,
       qm AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qraw
         FROM embeddings WHERE vec_id < 4),
       probes AS (SELECT qid, cell FROM (
           SELECT q.qid, k - 1 AS cell,
             row_number() OVER (PARTITION BY q.qid ORDER BY ${kmL2("q.qraw", "icb.c[k]")} ASC, k ASC) AS rn
           FROM (SELECT unnest(range(1, 9)) AS k), icb, qm q)
         WHERE rn <= 2),
       ncell AS MATERIALIZED (SELECT n.id, n.v, ${kmAssign("n.v", "icb.c")} AS cell FROM n, icb),
       res AS (SELECT i.id, i.v, i.cell, ${ivfRabitqResid("i.v", "i.cell")} AS rv
         FROM ncell i, icb WHERE i.cell IN (SELECT DISTINCT cell FROM probes)),
       enc AS MATERIALIZED (SELECT id, v, cell, ${rabitqRotD("rv")} AS r FROM res, sgl),
       rqe AS (SELECT id, v, cell, r,
         sqrt(list_sum(list_transform(r, x -> x * x))) AS rnorm,
         list_sum(list_transform(r, x -> abs(x))) AS sabs FROM enc),
       qres AS (SELECT p.qid, p.cell, ${ivfRabitqResid("q.qraw", "p.cell")} AS rv
         FROM probes p, icb, qm q WHERE q.qid = p.qid),
       qrot AS (SELECT qid, cell, ${rabitqRotD("rv")} AS r FROM qres, sgl),
       qn AS (SELECT qid, cell, r, sqrt(list_sum(list_transform(r, x -> x * x))) AS nqr FROM qrot),
       qh AS (SELECT qid, cell, nqr, CASE WHEN nqr > 0.0 THEN list_transform(r, x -> x / nqr)
         ELSE list_transform(r, x -> 0.0) END AS qhat FROM qn),
       sc AS (SELECT h.qid, e.id, e.rnorm, e.sabs, h.nqr,
           list_sum(list_transform(range(0, len(e.r)), i ->
             CASE WHEN e.r[i+1] >= 0.0 THEN h.qhat[i+1] ELSE -h.qhat[i+1] END)) AS sdot
         FROM rqe e JOIN qh h ON e.cell = h.cell),
       est AS (SELECT qid, id, $rabitqEst AS approx FROM sc),
       cand AS (SELECT qid, id FROM (SELECT qid, id,
           row_number() OVER (PARTITION BY qid ORDER BY approx ASC, id ASC) AS rn
         FROM est) WHERE rn <= 50),
       fin AS (SELECT c.qid, c.id, sqrt(${kmL2("n.v", "q.qraw")}) AS raw
         FROM cand c JOIN n ON n.id = c.id JOIN qm q ON q.qid = c.qid)
       SELECT qid, id, id AS value, (round(-raw, 6) + 0) AS score,
         (round(raw, 6) + 0) AS distance, 'l2' AS metric
       FROM (SELECT qid, id, raw,
           row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn
         FROM fin) WHERE rn <= 5"""

  /** Plain-IVF batch (no PQ): replicated coarse k-means, per-query
    * probe sets (nprobe=2), EXACT l2 inside the probed cells, per-query
    * top-10 — mirrors IvfIndex.searchManyPartitioned over a layout
    * trained with IvfConfig(k=8, iterations=3), id-ordered. */
  /** Partial-probe batch IVF, optionally over a filtered corpus: the
    * k-means and probe CTEs always see the FULL corpus (the model is
    * trained unfiltered; probes come from the queries alone) — the
    * predicate lands exactly where the engine applies it, on the stored
    * rows entering the probed cells. */
  private def ivfSearchManyOracleWhere(where: String) =
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       $ivfKmeansCtes,
       q AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qraw FROM embeddings WHERE vec_id < 4),
       probes AS (SELECT qid, cell FROM (
           SELECT q.qid, k - 1 AS cell,
             row_number() OVER (PARTITION BY q.qid ORDER BY ${kmL2("q.qraw", "icb.c[k]")} ASC, k ASC) AS rn
           FROM (SELECT unnest(range(1, 9)) AS k), icb, q)
         WHERE rn <= 2),
       ncell AS MATERIALIZED (SELECT n.id, n.v, ${kmAssign("n.v", "icb.c")} AS cell FROM n, icb),
       incell AS (SELECT p.qid, nc.id, nc.v FROM ncell nc JOIN probes p ON nc.cell = p.cell $where),
       fin AS (SELECT r.qid, r.id, sqrt(${kmL2("r.v", "q.qraw")}) AS raw
         FROM incell r JOIN q ON q.qid = r.qid),
       rk AS (SELECT qid, id, raw,
           row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn FROM fin)
       SELECT qid, id, id AS value, (round(-raw,6)+0) AS score, (round(raw,6)+0) AS distance, 'l2' AS metric
       FROM rk WHERE rn <= 10"""

  private val ivfSearchManyOracle = ivfSearchManyOracleWhere("")

  /** FAISS-style residual IVF-PQ: cells from the coarse quantizer, PQ
    * codebooks trained on (v - centroid[cell]) residuals, each probed
    * cell scored against its own query-residual ADC table — mirrors
    * IvfPq.trainResidual / searchResidual exactly. */
  private val ivfPqResidualOracle = {
    val resSlice = "r.res[(qs.sub*(len(r.res)//4)+1):((qs.sub+1)*(len(r.res)//4))]"
    s"""WITH RECURSIVE
       n AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id, vec_id, embedding AS v FROM embeddings),
       $ivfKmeansCtes,
       ncell AS MATERIALIZED (SELECT n.id, n.vec_id, n.v, icb.c AS allc, ${kmAssign("n.v", "icb.c")} AS cell FROM n, icb),
       nres AS MATERIALIZED (SELECT id, vec_id, cell,
           list_transform(range(0, len(v)), i -> CAST(v[i+1] - allc[cell+1][i+1] AS FLOAT)) AS v
         FROM ncell),
       ${pqKmeansCtes("nres")},
       q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
       probes AS (SELECT k - 1 AS cell FROM (SELECT unnest(range(1, 9)) AS k), icb, q
         ORDER BY ${kmL2("qraw", "icb.c[k]")} ASC, k ASC LIMIT 2),
       qres AS (SELECT p.cell,
           list_transform(range(0, len(q.qraw)), i -> CAST(q.qraw[i+1] - t.cc[i+1] AS FLOAT)) AS qr
         FROM probes p, q, icb, LATERAL (SELECT icb.c[p.cell+1] AS cc) t),
       qs AS (SELECT qres.cell, cb.sub,
           qres.qr[(cb.sub*(len(qres.qr)//4)+1):((cb.sub+1)*(len(qres.qr)//4))] AS qsv, cb.c
         FROM qres, cb),
       rows0 AS (SELECT id, cell, v AS res FROM nres WHERE cell IN (SELECT cell FROM probes)),
       rowsub AS (SELECT r.id, qs.sub, qs.qsv, qs.c,
           ${kmAssign(resSlice, "qs.c")} AS code
         FROM rows0 r JOIN qs ON qs.cell = r.cell),
       adc AS (SELECT r.id, list_sum(list(${kmL2("r.qsv", "r.c[r.code+1]")} ORDER BY r.sub)) AS approx
          FROM rowsub r GROUP BY r.id),
       cand AS (SELECT a.id, n.v FROM adc a JOIN n ON n.id = a.id ORDER BY a.approx ASC, a.id ASC LIMIT 50),
       fin AS (SELECT id, sqrt(${kmL2("v", "qraw")}) AS raw FROM cand, q)
       SELECT id, id AS value, (round(-raw,6)+0) AS score, (round(raw,6)+0) AS distance, 'l2' AS metric
       FROM fin ORDER BY raw ASC, id ASC LIMIT 10"""
  }

  /** SemDeDup fixture: original embeddings + 30 perturbed copies (ids
    * +10000, dim-0 +0.25 — cosine ~0.97 to their originals), centroids
    * from the same k=8/it=5 id-ordered training as data_cluster_mix so
    * the oracle's recursive-CTE k-means replicates them. */
  private def semanticFixture(s: SparkSession, dir: String): (DataFrame, Array[Array[Float]]) = {
    val d = Tables.dims(s, dir)
    val config = Tables.cosineConfig(d)
    val coll = Tables.embeddingsCollection(s, dir, config)
    val centroids = IvfIndex.trainOrdered(coll, config,
      IvfIndex.IvfConfig(k = 8, iterations = 5), col("id").cast("long"))
    val e = Tables.read(s, dir, "embeddings")
    val corpus = e.select(col("vec_id").cast("string").as("id"),
        col("embedding").as("vector"))
      .union(e.filter(col("vec_id") < 30).select(
        (col("vec_id") + 10000).cast("string").as("id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x.cast("double") + lit(0.25)).cast("float"))
            .otherwise(x)).as("vector")))
    (corpus, centroids)
  }

  /** SemDeDup oracle CTE tail (appended after [[ivfCosKmeansCtes]]):
    * the planted-copy corpus, its f32 normalization, cell assignment
    * through the trained centroids, and the verified pair set. */
  private val semDedupCtes: String = {
    def nrm(v: String) =
      s"list_transform($v, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform($v, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT))"
    s"""semc AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings
         UNION ALL SELECT CAST(vec_id + 10000 AS VARCHAR) AS id,
           list_transform(embedding, (x, i) -> CASE WHEN i = 1 THEN CAST(CAST(x AS DOUBLE) + 0.25 AS FLOAT) ELSE x END) AS v
         FROM embeddings WHERE vec_id < 30),
       semn AS (SELECT id, ${nrm("v")} AS nv FROM semc),
       sema AS (SELECT id, nv, ${ivfAssign("semn.nv", "cents.c")} AS cell FROM semn, cents),
       sempr AS (SELECT a.id AS id_a, b.id AS id_b, a.cell AS cell,
           list_sum(list_transform(range(1, len(a.nv)+1), i -> CAST(a.nv[i] AS DOUBLE) * CAST(b.nv[i] AS DOUBLE))) AS cosine
         FROM sema a JOIN sema b ON a.cell = b.cell AND a.id < b.id)"""
  }

  /** Shared BM25 CTE chain (docs → per-doc tf/dl HOFs → one-row corpus
    * stats → explicit sorted-term score fold) mirroring [[Bm25.scores]]
    * operation-for-operation: same left-assoc arithmetic, same
    * `ln((n-df+0.5)/(df+0.5)+1)` idf, same round-6 ranking key. */
  /** Stored-expected fixture for the three ann_hnsw_* gate rows: the
    * deterministic sf0.01 top-10 (id, 6-dp score) of the driver shim,
    * the 4-shard distributed build, and the persisted layout (all three
    * coincide at this scale — the graphs recover their true local
    * top-10). FixtureRegenSpec recomputes this from data every test run
    * and fails on any divergence, closing the "oracle = my own output"
    * loop a frozen literal would otherwise leave open. */
  val HnswFixtureSf001: Seq[(String, Double)] = Seq(
    "0" -> 1.0, "365" -> 0.369994, "334" -> 0.362722, "387" -> 0.331139,
    "423" -> 0.296934, "73" -> 0.295434, "7" -> 0.292842, "320" -> 0.287861,
    "190" -> 0.281795, "464" -> 0.276628)

  private def hnswFixtureSql: String = {
    val vals = HnswFixtureSf001
      .map { case (id, s) => s"('$id', $s)" }.mkString(",\n           ")
    s"""SELECT id, (CAST(score AS DOUBLE) + 0) AS score FROM (VALUES
           $vals) AS t(id, score)"""
  }

  /** Stored-expected fixture for text_bpe_tokens: the trained-BPE
    * tokenization of the sf0.01 held-out docs (doc_id, token count,
    * md5 of the joined tokens). Deterministic — merge ties break
    * lexicographically, the word table is (count desc, word asc);
    * BpeSpec's hand-derived classic fixture backs the freeze and
    * FixtureRegenSpec re-derives this table from a fresh training run. */
  val BpeFixtureSf001: Seq[(Int, Int, String)] = Seq(
    (490, 153, "82a8a0f1b3e308bb76e11bf6bc8a4b55"),
    (491, 194, "751e8c6979131eb682bf489862ac7cd7"),
    (492, 48, "320a94413d77b7f39450929d73fb012e"),
    (493, 258, "264e6a3b43c5ec8f530476acd1e22b1e"),
    (494, 129, "909ddfdea5f3096c2d78bc44df4c148d"),
    (495, 232, "31443616c257faf4e2c1e9c473ee826b"),
    (496, 280, "1cbe73ab512f5e4aefad6ee88572906e"),
    (497, 62, "0039d1566fcc4ebdfac80ded2959a90c"),
    (498, 284, "42798f6a055e438b084cc4dfcdfdf765"),
    (499, 111, "1688e3bff7512daae9cc1c3665e5d2d5"))

  private def bpeFixtureSql: String = {
    val vals = BpeFixtureSf001
      .map { case (d, n, m) => s"($d, $n, '$m')" }.mkString(",\n           ")
    s"""SELECT CAST(c0 AS INT) AS doc_id, CAST(c1 AS INT) AS n_bpe_tokens, c2 AS bpe_md5
         FROM (VALUES
           $vals) t(c0, c1, c2)
         ORDER BY doc_id"""
  }

  private def bm25Ctes(terms: Seq[String], k1: String = "1.2",
      b: String = "0.75"): String = {
    val ts = terms.map(_.toLowerCase).distinct.sorted
    val tfSel = ts.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(lt, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfSel = ts.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val contrib = ts.indices.map { i =>
      s"""ln((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5) + 1.0)
         * (CAST(tf$i AS DOUBLE) * ($k1 + 1.0))
         / (CAST(tf$i AS DOUBLE) + $k1 * (1.0 - $b + $b * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))"""
    }.mkString(" + ")
    s"""bmd AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt FROM documents),
       bmb AS (SELECT doc_id, CAST(len(lt) AS BIGINT) AS dl, $tfSel FROM bmd),
       bms AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl, $dfSel FROM bmb),
       bmsc AS (SELECT doc_id, dl, ($contrib) AS score FROM bmb, bms)"""
  }

  def oracleSql: Map[String, String] = Map(
    "ann_ivf_full_probe_topk" -> flatCosineOracle,
    "ann_ivf_partitioned_topk" -> flatCosineOracle,
    "ann_ivf_topk" -> ivfPartialProbeOracle,
    "ann_ivf_adaptive_topk" -> ivfAdaptiveProbeOracle,
    "ann_sq8_topk" -> sq8Oracle,
    "ann_rabitq_estimator" -> rabitqEstimatorOracle,
    "ann_rabitq_topk" -> rabitqOracle,
    "ann_rabitq_search_many" -> rabitqSearchManyOracle,
    "ann_pq_topk" -> pqOracle,
    "ann_apq_topk" -> flatCosineOracle,
    "ann_opq_topk" -> opqOracle,
    "ann_ivfpq_topk" -> ivfPqOracle,
    "ann_ivfpq_search_many" -> ivfPqSearchManyOracle,
    "ann_ivfrabitq_topk" -> ivfRabitqOracle,
    "ann_ivfrabitq_search_many" -> ivfRabitqSearchManyOracle,
    // static cell pruning changes the scan, not the results
    "ann_ivfpq_partitioned_search_many" -> ivfPqSearchManyOracle,
    "ann_ivf_partitioned_search_many" -> ivfSearchManyOracle,
    // filtered search: the predicate is applied on the stored rows only
    // (post-filter semantics) — full probe ≡ exact filtered flat; the
    // partial-probe batch replicates k-means + probes on the FULL
    // corpus and filters at the in-cell stage, like the engine
    "ann_ivf_filtered_topk" ->
      flatCosineOracleWhere("WHERE CAST(vec_id AS VARCHAR) >= '5'"),
    "ann_ivf_filtered_search_many" ->
      ivfSearchManyOracleWhere("WHERE nc.id >= '3'"),
    // the oversampled beams recover the exact filtered top-10 at the
    // gate scale (if this row ever fails with the list's TAIL
    // differing, the beams stopped covering — widen oversample). The
    // query emits (id, score) only, so project the shared oracle down.
    "ann_hnsw_filtered_topk" ->
      s"""SELECT id, score FROM (
         ${flatCosineOracleWhere("WHERE CAST(vec_id AS VARCHAR) >= '5'")})""",
    "ann_ivfpq_partitioned_topk" -> ivfPqOracle,
    "ann_ivfpq_residual_topk" -> ivfPqResidualOracle,
    "ann_lsh_topk" -> lshOracle,

    // Vamana rows: exact at the gate scale (autoscaled beams cover each
    // connected shard graph — see the query comments), so the oracles
    // are DATA-DERIVED flat-cosine SQL, not stored fixtures
    "ann_vamana_topk" ->
      s"SELECT id, score FROM ($flatCosineOracle)",
    "ann_vamana_persisted_topk" ->
      s"SELECT id, score FROM ($flatCosineOracle)",
    "ann_vamana_filtered_topk" ->
      s"""SELECT id, score FROM (
         ${flatCosineOracleWhere("WHERE CAST(vec_id AS VARCHAR) >= '5'")})""",
    "ann_vamana_search_many" -> {
      def nrm(v: String) =
        s"list_transform($v, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform($v, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT))"
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${nrm("embedding")} AS nv FROM embeddings),
         qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, ${nrm("embedding")} AS qv FROM embeddings WHERE vec_id < 4),
         sc AS (SELECT qid, id, list_sum(list_transform(range(1, len(nv)+1), i -> CAST(nv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS raw FROM n, qs),
         rk AS (SELECT qid, id, raw, row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, id ASC) AS rn FROM sc)
         SELECT qid, id, (round(raw, 6) + 0) AS score
         FROM rk WHERE rn <= 5"""
    },

    // stored-expected FIXTURE oracle: the HNSW build is deterministic
    // (FNV-1a levels, sorted insertion, fixed seeds — pinned by
    // HnswSpec's rebuild-determinism test), so the sf0.01 top-10 is a
    // constant. A VALUES literal makes the one previously un-oracled
    // row a real regression tripwire: any change to level hashing,
    // neighbor pruning, or the greedy walk shifts the tail of this
    // list. FixtureRegenSpec recomputes the fixture from a fresh
    // deterministic build every test run and diffs it against
    // [[HnswFixtureSf001]] — the fixture can never silently drift from
    // what the engine actually produces. Regenerate via
    // GRAFT_VERIFY_ONLY=ann_hnsw_topk on deliberate parameter change.
    "ann_hnsw_topk" -> hnswFixtureSql,

    // same fixture-oracle mechanism for the DISTRIBUTED path: 4-shard
    // search is deterministic (hash partition, id-sorted insertion),
    // and at sf0.01 every shard graph recovers its true local top-10,
    // so the merged list coincides with the driver shim's.
    "ann_hnsw_sharded_topk" -> hnswFixtureSql,
    // the persisted layout serves bit-identically to the sharded build
    // path (Hnsw.fromState round-trip, pinned in ShardedHnswSpec), so
    // it shares the fixture
    "ann_hnsw_persisted_topk" -> hnswFixtureSql,
    "dedup_embedding_lsh" -> embeddingLshOracle,
    "dedup_embedding_against" -> embeddingAgainstOracle,

    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $tokensSql AS toks FROM documents),
         m AS (SELECT doc_id, len(toks) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_regex_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
           CAST(len(list_filter(toks, t -> t IN ($enList))) AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
           CAST(length(text) AS DOUBLE) AS n_chars FROM t)
         SELECT doc_id, n_tokens, n_regex_tokens, n_punct,
           (round(stop_ratio, 6) + 0) AS stop_ratio,
           (round(0.4 * least(1.0, CAST(greatest(n_tokens,1) AS DOUBLE) / 20.0)
                + 0.4 * least(1.0, stop_ratio * 4.0)
                + 0.2 * (1.0 - least(1.0, (CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 5.0)), 6) + 0) AS quality
         FROM m ORDER BY doc_id""",

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         c AS (SELECT doc_id, ${langCount("de")} AS cde, ${langCount("en")} AS cen,
                ${langCount("es")} AS ces, ${langCount("fr")} AS cfr FROM t)
         SELECT doc_id, CASE WHEN greatest(cde, cen, ces, cfr) = 0 THEN 'und'
           WHEN cde = greatest(cde, cen, ces, cfr) THEN 'de'
           WHEN cen = greatest(cde, cen, ces, cfr) THEN 'en'
           WHEN ces = greatest(cde, cen, ces, cfr) THEN 'es'
           ELSE 'fr' END AS lang_detected
         FROM c ORDER BY doc_id""",

    "text_gopher_quality" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM documents),
         t2 AS (SELECT doc_id, toks, ls, lt, ${shinglesSql(2)} AS sh2 FROM t),
         m AS (SELECT doc_id,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac,
           CASE WHEN len(sh2) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(sh2), d -> len(list_filter(sh2, x -> x = d)))) AS DOUBLE) / len(sh2) END AS top_2gram_frac
         FROM t2)
         SELECT doc_id, n_words,
           (round(mean_word_len, 6) + 0) AS mean_word_len,
           (round(frac_alpha, 6) + 0) AS frac_alpha,
           (round(frac_symbol, 6) + 0) AS frac_symbol,
           (round(frac_bullet, 6) + 0) AS frac_bullet,
           (round(frac_ellipsis, 6) + 0) AS frac_ellipsis,
           (round(frac_dup_lines, 6) + 0) AS frac_dup_lines,
           (round(top_token_frac, 6) + 0) AS top_token_frac,
           (round(top_2gram_frac, 6) + 0) AS top_2gram_frac,
           CAST(n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2 AS INT) AS keep
         FROM m ORDER BY doc_id""",

    // the five stages replicated in one SQL chain: Gopher keep formula,
    // min-id-per-md5 canonical dedup, zero-shared-5-gram decontamination
    // against the same eval set, md5-bucket stratified sampling, dense
    // row_number ids
    "pipeline_curation" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM documents),
         m AS (SELECT doc_id, lang, text, toks,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         k AS (SELECT doc_id, lang, text, toks FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         dd AS (SELECT doc_id, lang, toks FROM (
             SELECT doc_id, lang, toks, min(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM k)
           WHERE doc_id = canon),
         be AS (SELECT DISTINCT unnest(list_distinct(${shinglesSql(5)})) AS gr
           FROM t WHERE doc_id >= 480 OR doc_id < 10),
         dg AS (SELECT doc_id, lang, list_distinct(${shinglesSql(5)}) AS gs FROM dd),
         dirty AS (SELECT DISTINCT ex.doc_id
           FROM (SELECT doc_id, unnest(gs) AS gr FROM dg) ex JOIN be USING (gr)),
         clean AS (SELECT doc_id, lang FROM dg
           WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         samp AS (SELECT doc_id, lang FROM (SELECT doc_id, lang,
             CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) AS bucket
           FROM clean)
           WHERE bucket < (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 1000 ELSE 100 END))
         SELECT doc_id, lang,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
         FROM samp ORDER BY doc_id""",

    "pipeline_curation_report" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM documents),
         m AS (SELECT doc_id, lang, text, toks,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         k AS (SELECT doc_id, lang, text, toks FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         dd AS (SELECT doc_id, lang, toks FROM (
             SELECT doc_id, lang, toks, min(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM k)
           WHERE doc_id = canon),
         be AS (SELECT DISTINCT unnest(list_distinct(${shinglesSql(5)})) AS gr
           FROM t WHERE doc_id >= 480 OR doc_id < 10),
         dg AS (SELECT doc_id, lang, list_distinct(${shinglesSql(5)}) AS gs FROM dd),
         dirty AS (SELECT DISTINCT ex.doc_id
           FROM (SELECT doc_id, unnest(gs) AS gr FROM dg) ex JOIN be USING (gr)),
         clean AS (SELECT doc_id, lang FROM dg
           WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         samp AS (SELECT doc_id, lang FROM (SELECT doc_id, lang,
             CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) AS bucket
           FROM clean)
           WHERE bucket < (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 1000 ELSE 100 END))
         SELECT * FROM (VALUES
           (CAST(0 AS INT), 'input', (SELECT CAST(count(*) AS BIGINT) FROM t)),
           (CAST(1 AS INT), 'quality_gate', (SELECT CAST(count(*) AS BIGINT) FROM k)),
           (CAST(2 AS INT), 'exact_dedup', (SELECT CAST(count(*) AS BIGINT) FROM dd)),
           (CAST(3 AS INT), 'decontaminate', (SELECT CAST(count(*) AS BIGINT) FROM clean)),
           (CAST(4 AS INT), 'stratified_mix', (SELECT CAST(count(*) AS BIGINT) FROM samp)))
           v(stage_idx, stage, n_rows) ORDER BY stage_idx""",

    // six stages in one SQL chain: the curation oracle plus the MinHash
    // signature -> band-bucket candidates -> exact-Jaccard verify ->
    // recursive-CTE connected components -> keep-cluster-minimum rule
    "pipeline_curation_neardup" ->
      s"""WITH RECURSIVE aug AS (
           SELECT doc_id, lang, text FROM documents
           UNION ALL SELECT doc_id + 10000, lang, text || ' zzextra'
           FROM documents WHERE doc_id < 30),
         t AS (SELECT doc_id, lang, text, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM aug),
         m AS (SELECT doc_id, lang, text, toks,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         k AS (SELECT doc_id, lang, text, toks FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         dd AS (SELECT doc_id, lang, toks FROM (
             SELECT doc_id, lang, toks, min(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM k)
           WHERE doc_id = canon),
         shs AS (SELECT doc_id, list_distinct(${shinglesSql(3)}) AS sh FROM dd),
         sig AS (SELECT doc_id, sh, ${minhashSigSql(8)} AS sig FROM shs),
         bandt AS (SELECT doc_id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bandt a JOIN bandt b ON a.band = b.band AND a.doc_id < b.doc_id),
         ver AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
             FROM cand JOIN shs sa ON sa.doc_id = cand.id_a JOIN shs sb ON sb.doc_id = cand.id_b)
           WHERE jaccard >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM dd
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         nd AS (SELECT dd.doc_id, dd.lang, dd.toks FROM dd
           JOIN cl ON cl.id = dd.doc_id WHERE cl.cluster_id = dd.doc_id),
         tb AS (SELECT doc_id, $tokensSql AS toks FROM documents
           WHERE doc_id >= 480 OR doc_id < 10),
         be AS (SELECT DISTINCT unnest(list_distinct(${shinglesSql(5)})) AS gr FROM tb),
         dg AS (SELECT doc_id, lang, list_distinct(${shinglesSql(5)}) AS gs FROM nd),
         dirty AS (SELECT DISTINCT ex.doc_id
           FROM (SELECT doc_id, unnest(gs) AS gr FROM dg) ex JOIN be USING (gr)),
         clean AS (SELECT doc_id, lang FROM dg
           WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         samp AS (SELECT doc_id, lang FROM (SELECT doc_id, lang,
             CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) AS bucket
           FROM clean)
           WHERE bucket < (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 1000 ELSE 100 END))
         SELECT doc_id, lang,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
         FROM samp ORDER BY doc_id""",

    // gopher gate + exact dedup + SemDeDup over the centroids the
    // ivfCosKmeansCtes chain trains (the SAME model the Spark side
    // passes via semanticCentroids) + connected-component min-id keep +
    // sequential ids — the semantic-curation facade end-to-end
    "pipeline_curation_semantic" ->
      s"""WITH RECURSIVE
         $ivfCosKmeansCtes,
         base AS (SELECT d.doc_id, d.lang, d.text, e.embedding
           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
         aug AS (SELECT doc_id, lang, text, embedding FROM base
           UNION ALL SELECT doc_id + 10000, lang, text || ' reworded paraphrase marker',
             list_transform(embedding, (x, i) -> CASE WHEN i = 1 THEN CAST(CAST(x AS DOUBLE) + 0.25 AS FLOAT) ELSE x END)
           FROM base WHERE doc_id < 30),
         t AS (SELECT doc_id, lang, text, embedding, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM aug),
         m AS (SELECT doc_id, lang, text, embedding,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         k AS (SELECT doc_id, lang, text, embedding FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         dd AS (SELECT doc_id, lang, embedding FROM (
             SELECT doc_id, lang, embedding, min(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM k)
           WHERE doc_id = canon),
         nrmc AS (SELECT doc_id, lang,
           list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv
         FROM dd),
         sema AS (SELECT doc_id, lang, nv, ${ivfAssign("nrmc.nv", "cents.c")} AS cell
           FROM nrmc, cents),
         ver AS (SELECT id_a, id_b FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             list_sum(list_transform(range(1, len(a.nv)+1), i -> CAST(a.nv[i] AS DOUBLE) * CAST(b.nv[i] AS DOUBLE))) AS cosine
             FROM sema a JOIN sema b ON a.cell = b.cell AND a.doc_id < b.doc_id)
           WHERE cosine >= 0.9),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM dd
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         keepr AS (SELECT dd.doc_id, dd.lang FROM dd
           JOIN cl ON cl.id = dd.doc_id WHERE cl.cluster_id = dd.doc_id)
         SELECT doc_id, lang,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
         FROM keepr ORDER BY doc_id""",

    "data_split" ->
      s"""WITH b AS (SELECT doc_id,
           CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) AS bucket
         FROM documents)
         SELECT doc_id,
           CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
           bucket, CAST(bucket < 250 AS INT) AS in_sample
         FROM b ORDER BY doc_id""",

    "data_token_budget_mix" ->
      s"""WITH w AS (SELECT * FROM (VALUES ('src0', 0.6), ('src1', 0.2), ('src2', 0.2)) t(src, wn)),
         a AS (SELECT source, CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS avail_tokens
           FROM documents GROUP BY source)
         SELECT a.source, a.avail_tokens,
           (round(coalesce(w.wn, 0.0) * 20000.0, 6) + 0) AS target_tokens,
           CAST(round(least(1.0, coalesce(w.wn, 0.0) * 20000.0 / CAST(a.avail_tokens AS DOUBLE)) * 1000.0, 0) AS INT) AS keep_rate_x1000,
           (round(coalesce(w.wn, 0.0) * 20000.0 / CAST(a.avail_tokens AS DOUBLE), 6) + 0) AS epochs
         FROM a LEFT JOIN w ON w.src = a.source ORDER BY a.source""",

    "data_token_budget_apply" ->
      s"""WITH w AS (SELECT * FROM (VALUES ('src0', 0.6), ('src1', 0.2), ('src2', 0.2)) t(src, wn)),
         a AS (SELECT source, CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS avail_tokens
           FROM documents GROUP BY source),
         r AS (SELECT a.source,
             CAST(round(least(1.0, coalesce(w.wn, 0.0) * 20000.0 / CAST(a.avail_tokens AS DOUBLE)) * 1000.0, 0) AS INT) AS keep_rate_x1000
           FROM a LEFT JOIN w ON w.src = a.source)
         SELECT d.doc_id, d.source, r.keep_rate_x1000
         FROM documents d JOIN r ON r.source = d.source
         WHERE CAST(('0x' || substr(md5('graft' || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) < r.keep_rate_x1000
         ORDER BY d.doc_id""",

    "data_psi_drift" ->
      s"""WITH r AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents WHERE doc_id < 400),
         c AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents WHERE doc_id >= 400),
         mm AS (SELECT CAST(min(x) AS DOUBLE) AS mn, CAST(max(x) AS DOUBLE) AS mx FROM r),
         b AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bucket),
         rb AS (SELECT least(9, greatest(0, CAST(floor((x - mm.mn) / ((mm.mx - mm.mn) / 10)) AS INT))) AS bucket,
             CAST(count(*) AS BIGINT) AS nr FROM r, mm GROUP BY 1),
         cb AS (SELECT least(9, greatest(0, CAST(floor((x - mm.mn) / ((mm.mx - mm.mn) / 10)) AS INT))) AS bucket,
             CAST(count(*) AS BIGINT) AS nc FROM c, mm GROUP BY 1),
         j AS (SELECT b.bucket, coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
           FROM b LEFT JOIN rb USING(bucket) LEFT JOIN cb USING(bucket)),
         t AS (SELECT CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc FROM j),
         p AS (SELECT bucket,
             greatest(CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE), 1e-6) AS pa,
             greatest(CAST(nc AS DOUBLE) / CAST(tc AS DOUBLE), 1e-6) AS pb
           FROM j, t)
         SELECT bucket, (round(pa, 6) + 0) AS ref_frac, (round(pb, 6) + 0) AS cur_frac,
           (round((pa - pb) * ln(pa / pb), 6) + 0) AS psi_term
         FROM p ORDER BY bucket""",

    "data_psi_drift_by_lang" ->
      s"""WITH r AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE doc_id < 400 AND n_chars IS NOT NULL),
         c AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE doc_id >= 400 AND n_chars IS NOT NULL),
         mm AS (SELECT g, CAST(min(x) AS DOUBLE) AS mn, CAST(max(x) AS DOUBLE) AS mx FROM r GROUP BY g HAVING max(x) > min(x)),
         b AS (SELECT g, CAST(unnest(range(0, 10)) AS INT) AS bucket FROM mm),
         rb AS (SELECT r.g, least(9, greatest(0, CAST(floor((x - mn) / ((mx - mn) / 10)) AS INT))) AS bucket,
             CAST(count(*) AS BIGINT) AS nr FROM r JOIN mm ON mm.g = r.g GROUP BY 1, 2),
         cb AS (SELECT c.g, least(9, greatest(0, CAST(floor((x - mn) / ((mx - mn) / 10)) AS INT))) AS bucket,
             CAST(count(*) AS BIGINT) AS nc FROM c JOIN mm ON mm.g = c.g GROUP BY 1, 2),
         j AS (SELECT b.g, b.bucket, coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
           FROM b LEFT JOIN rb ON rb.g = b.g AND rb.bucket = b.bucket
             LEFT JOIN cb ON cb.g = b.g AND cb.bucket = b.bucket),
         t AS (SELECT g, CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc FROM j GROUP BY g),
         p AS (SELECT j.g, j.bucket,
             greatest(CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE), 1e-6) AS pa,
             CASE WHEN tc > 0 THEN greatest(CAST(nc AS DOUBLE) / CAST(tc AS DOUBLE), 1e-6) ELSE 1e-6 END AS pb
           FROM j JOIN t ON t.g = j.g)
         SELECT g AS lang, bucket, (round(pa, 6) + 0) AS ref_frac, (round(pb, 6) + 0) AS cur_frac,
           (round((pa - pb) * ln(pa / pb), 6) + 0) AS psi_term
         FROM p ORDER BY 1, 2""",

    "data_smd_drift" ->
      s"""WITH r AS (SELECT CAST(count(*) AS DOUBLE) AS rn, sum(CAST(n_chars AS DOUBLE)) AS rs,
             sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS rss
           FROM documents WHERE doc_id < 400),
         c AS (SELECT CAST(count(*) AS DOUBLE) AS cn, sum(CAST(n_chars AS DOUBLE)) AS cs,
             sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS css
           FROM documents WHERE doc_id >= 400),
         m AS (SELECT rs / rn AS rm, cs / cn AS cm,
             rss / rn - (rs / rn) * (rs / rn) AS rv,
             css / cn - (cs / cn) * (cs / cn) AS cv, rn, cn FROM r, c)
         SELECT (round(rm, 6) + 0) AS ref_mean, (round(cm, 6) + 0) AS cur_mean,
           (round(sqrt((rv * rn + cv * cn) / (rn + cn)), 6) + 0) AS pooled_std,
           (round((cm - rm) / sqrt((rv * rn + cv * cn) / (rn + cn)), 6) + 0) AS smd
         FROM m""",

    "data_kcenter_coreset" -> {
      def l2(x: String, y: String) =
        s"sqrt(list_sum(list_transform(range(1, len($x)+1), i -> (CAST($x[i] AS DOUBLE) - CAST($y[i] AS DOUBLE)) * (CAST($x[i] AS DOUBLE) - CAST($y[i] AS DOUBLE)))))"
      val rounds = (1 to 3).map { t =>
        val prevD = s"d${t - 1}"
        s"""p$t AS (SELECT id, v, mind FROM $prevD ORDER BY mind DESC, id LIMIT 1),
           d$t AS (SELECT $prevD.id, $prevD.v, least($prevD.mind, ${l2(s"$prevD.v", s"p$t.v")}) AS mind
             FROM $prevD, p$t WHERE $prevD.id != p$t.id)"""
      }.mkString(",\n         ")
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings WHERE vec_id < 60),
         sd AS (SELECT id, v FROM n ORDER BY id LIMIT 1),
         d0 AS (SELECT n.id, n.v, ${l2("n.v", "sd.v")} AS mind FROM n, sd WHERE n.id != sd.id),
         $rounds
         SELECT sd.id, CAST(0 AS INT) AS pick_order, 0.0 AS center_distance FROM sd
         UNION ALL SELECT p1.id, CAST(1 AS INT), (round(p1.mind, 6) + 0) FROM p1
         UNION ALL SELECT p2.id, CAST(2 AS INT), (round(p2.mind, 6) + 0) FROM p2
         UNION ALL SELECT p3.id, CAST(3 AS INT), (round(p3.mind, 6) + 0) FROM p3
         ORDER BY pick_order"""
    },

    "data_weighted_sample" ->
      s"""WITH b AS (SELECT doc_id, n_chars,
           ln((('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
              / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS pr
         FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
         SELECT doc_id, n_chars, (round(pr, 6) + 0) AS priority
         FROM b ORDER BY pr DESC, doc_id LIMIT 120""",

    "data_weighted_sample_per_lang" ->
      s"""WITH b AS (SELECT doc_id, lang, n_chars,
           ln((('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
              / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS pr
         FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         r AS (SELECT doc_id, lang, n_chars, pr,
           row_number() OVER (PARTITION BY lang ORDER BY pr DESC, doc_id) AS rn FROM b)
         SELECT doc_id, lang, n_chars, (round(pr, 6) + 0) AS priority
         FROM r WHERE rn <= 15 ORDER BY doc_id""",

    "data_dsir_weights" ->
      s"""WITH $dsirCtes
         SELECT doc_id, (round(lw, 6) + 0) AS dsir_logw
         FROM dsirw ORDER BY doc_id""",

    "data_dsir_resample" ->
      s"""WITH $dsirCtes,
         k AS (SELECT doc_id, lw +
             -ln(-ln((('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                     / 4503599627370496.0)) AS gk
           FROM dsirw)
         SELECT doc_id, (round(gk, 6) + 0) AS gumbel_key
         FROM k ORDER BY gk DESC, doc_id LIMIT 100""",

    // quality gate (the pipeline_curation Gopher CTEs) -> fit/score-
    // separated DSIR (raw counts from the md5 half-sample, scoring over
    // every gated row) -> Gumbel-top-80 -> dense sequential ids
    "pipeline_curation_dsir" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM documents),
         m AS (SELECT doc_id, lang, text, toks,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         kq AS (SELECT doc_id, lang, text FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         ${dsirCtesOver("kq", hashSamplePred(500))},
         g AS (SELECT doc_id, lw +
             -ln(-ln((('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                     / 4503599627370496.0)) AS gk
           FROM dsirw),
         top AS (SELECT g.doc_id, kq.lang, g.gk
           FROM g JOIN kq USING (doc_id)
           ORDER BY g.gk DESC, g.doc_id LIMIT 80)
         SELECT doc_id, lang, (round(gk, 6) + 0) AS gumbel_key,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
         FROM top ORDER BY doc_id""",

    "data_leakage_split" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         shs AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM t),
         sig AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shs),
         bandt AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sig),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bandt a JOIN bandt b ON a.band = b.band AND a.id < b.id),
         ver AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
             FROM cand JOIN shs sa ON sa.id = cand.id_a JOIN shs sb ON sb.id = cand.id_b)
           WHERE jaccard >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT id, id FROM corpus
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
         SELECT id, cluster_id,
           CASE WHEN CAST(('0x' || substr(md5('graft' || ':' || CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) < 800
                THEN 'train' ELSE 'test' END AS split
         FROM lab ORDER BY id""",

    "data_stratified_sample" ->
      s"""WITH b AS (SELECT doc_id, lang,
           CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) AS bucket
         FROM documents)
         SELECT doc_id, lang FROM b
         WHERE bucket < (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 1000 ELSE 100 END)
         ORDER BY doc_id""",

    "data_cluster_mix" ->
      s"""WITH RECURSIVE
         $ivfCosKmeansCtes,
         asg AS (SELECT n.id, ${ivfAssign("n.nv", "cents.c")} AS mix_cell,
           CAST(('0x' || substr(md5('graft' || ':' || n.id), 1, 8))::BIGINT % 1000 AS INT) AS bucket
           FROM n, cents)
         SELECT id, mix_cell FROM asg
         WHERE bucket < (CASE WHEN mix_cell = 0 THEN 1000 WHEN mix_cell = 1 THEN 500
                              WHEN mix_cell = 2 THEN 250 ELSE 100 END)
         ORDER BY id""",

    "data_pack_sequences" ->
      s"""WITH c AS (SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens FROM documents),
         w AS (SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
         FROM c)
         SELECT doc_id, n_tokens, token_start AS pack_token_start,
           token_start // 512 AS pack_bin, token_start % 512 AS pack_offset,
           (CASE WHEN n_tokens > 0 THEN token_start + n_tokens - 1 ELSE token_start END) // 512 AS pack_end_bin
         FROM w ORDER BY doc_id""",

    "data_domain_cap" ->
      s"""SELECT doc_id, source FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn <= 15 ORDER BY doc_id""",

    "text_contamination" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         g AS (SELECT doc_id, list_distinct(${shinglesSql(5)}) AS gs FROM t),
         be AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id >= 480 OR doc_id < 10),
         tr AS (SELECT doc_id, gs FROM g WHERE doc_id < 200),
         ex AS (SELECT doc_id, unnest(gs) AS gr FROM tr),
         sh AS (SELECT ex.doc_id, count(*) AS n_shared FROM ex JOIN be USING (gr) GROUP BY ex.doc_id),
         tot AS (SELECT doc_id, len(gs) AS n_grams FROM tr)
         SELECT tot.doc_id AS id, CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
           CAST(tot.n_grams AS BIGINT) AS n_grams,
           (round(CAST(coalesce(sh.n_shared, 0) AS DOUBLE) / tot.n_grams, 6) + 0) AS contamination
         FROM tot LEFT JOIN sh ON sh.doc_id = tot.doc_id ORDER BY id""",

    "text_token_percentiles" ->
      s"""WITH c AS (SELECT doc_id, len($tokensSql) AS n_tokens FROM documents),
         nn AS (SELECT count(*)::BIGINT AS n FROM c),
         r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS seq FROM c),
         t AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS pct)
         SELECT t.pct AS pct, r.n_tokens
         FROM r JOIN t ON r.seq = CAST(floor(((SELECT n FROM nn) - 1) * t.pct) AS BIGINT)
         ORDER BY pct""",

    "text_dedup_lines" ->
      s"""WITH noisy AS (SELECT doc_id,
           concat_ws(chr(10), text, 'footer line', text, 'footer line', 'unique tail') AS text
         FROM documents),
         s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM noisy),
         c AS (SELECT doc_id, len(ls) AS n_lines_before,
           list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept FROM s)
         SELECT doc_id, CAST(n_lines_before AS INT) AS n_lines_before,
           CAST(len(kept) AS INT) AS n_lines_after,
           md5(array_to_string(kept, chr(10))) AS clean_md5
         FROM c ORDER BY doc_id""",

    "text_tfidf_top" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents WHERE doc_id < 100),
         toks AS (SELECT doc_id, lower(unnest(toks)) AS term FROM d),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
         dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         nn AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM d),
         sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             CAST(tf.tf AS DOUBLE) * (nn.n + 1.0) / (dfq.df + 1.0) AS score,
             row_number() OVER (PARTITION BY tf.doc_id ORDER BY CAST(tf.tf AS DOUBLE) * (nn.n + 1.0) / (dfq.df + 1.0) DESC, tf.term ASC) AS rn
           FROM tf JOIN dfq USING (term), nn)
         SELECT doc_id, term, tf, df, (round(score, 6) + 0) AS score
         FROM sc WHERE rn <= 3 ORDER BY doc_id, rn""",

    "emb_pca_covariance" ->
      s"""WITH dd AS (SELECT len(embedding) AS dims FROM embeddings LIMIT 1),
         idx AS (SELECT unnest(range(0, (SELECT dims FROM dd))) AS i),
         pij AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b WHERE a.i <= b.i),
         mom AS (SELECT p.i, p.j,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(embedding[p.i+1] AS DOUBLE)) AS sum_i,
             sum(CAST(embedding[p.j+1] AS DOUBLE)) AS sum_j,
             sum(CAST(embedding[p.i+1] AS DOUBLE) * CAST(embedding[p.j+1] AS DOUBLE)) AS sum_ij
           FROM pij p, embeddings GROUP BY p.i, p.j)
         SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           (round(sum_ij / CAST(n AS DOUBLE) - (sum_i / CAST(n AS DOUBLE)) * (sum_j / CAST(n AS DOUBLE)), 9) + 0) AS cov
         FROM mom ORDER BY i, j""",

    "text_bigram_ppl" ->
      s"""WITH allt AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt FROM documents),
         trn AS (SELECT * FROM allt WHERE doc_id < 400),
         tst AS (SELECT * FROM allt WHERE doc_id >= 400),
         tbg AS (SELECT lt[i.i+1] AS w1, lt[i.i+2] AS w2 FROM trn, LATERAL (SELECT unnest(range(0, len(lt)-1)) AS i) i WHERE len(lt) >= 2),
         bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM tbg GROUP BY w1, w2),
         hd AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
         vn AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM (SELECT unnest(lt) AS term FROM trn)),
         sbg AS (SELECT doc_id, i.i AS pos, lt[i.i+1] AS w1, lt[i.i+2] AS w2 FROM tst, LATERAL (SELECT unnest(range(0, len(lt)-1)) AS i) i WHERE len(lt) >= 2),
         ctb AS (SELECT doc_id, struct_pack(p := pos, c := ln((CAST(coalesce(bgc.c12, 0) AS DOUBLE) + 1.0) / (CAST(coalesce(hd.c1, 0) AS DOUBLE) + CAST(vn.v AS DOUBLE)))) AS pc
           FROM sbg LEFT JOIN bgc ON bgc.w1 = sbg.w1 AND bgc.w2 = sbg.w2 LEFT JOIN hd ON hd.w1 = sbg.w1, vn),
         sums AS (SELECT doc_id, list_sum(list_transform(list_sort(list(pc)), x -> struct_extract(x, 'c'))) AS s, CAST(count(*) AS BIGINT) AS nb FROM ctb GROUP BY doc_id)
         SELECT t.doc_id, CAST(coalesce(sums.nb, 0) AS BIGINT) AS n_bigrams,
           (CASE WHEN sums.nb > 0 THEN round((0.0 - sums.s) / CAST(sums.nb AS DOUBLE), 6) + 0 ELSE NULL END) AS logppl
         FROM tst t LEFT JOIN sums ON sums.doc_id = t.doc_id ORDER BY t.doc_id""",

    "text_corpus_profile" ->
      s"""WITH t AS (SELECT lang, len($tokensSql) AS nt FROM documents),
         b AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens,
             avg(CAST(nt AS DOUBLE)) AS mean_tokens,
             CAST(min(nt) AS INT) AS min_tokens, CAST(max(nt) AS INT) AS max_tokens FROM t),
         g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
         e AS (SELECT 0.0 - sum((CAST(n AS DOUBLE) / CAST(tt.s AS DOUBLE)) * ln(CAST(n AS DOUBLE) / CAST(tt.s AS DOUBLE))) AS group_entropy,
             CAST(count(*) AS BIGINT) AS n_groups
           FROM g, (SELECT CAST(sum(n) AS BIGINT) AS s FROM g) tt)
         SELECT b.n_docs, b.total_tokens, (round(b.mean_tokens, 6) + 0) AS mean_tokens,
           b.min_tokens, b.max_tokens, (round(e.group_entropy, 6) + 0) AS group_entropy, e.n_groups
         FROM b, e""",

    "text_blocklist" ->
      s"""WITH t AS (SELECT doc_id, list_transform($tokensSql, x -> lower(x)) AS lt FROM documents)
         SELECT doc_id,
           CAST(len(list_filter(lt, x -> x IN ('spark', 'fast', 'slow'))) AS INT) AS n_hits,
           (round(CAST(len(list_filter(lt, x -> x IN ('spark', 'fast', 'slow'))) AS DOUBLE) / len(lt), 6) + 0) AS hit_frac
         FROM t ORDER BY doc_id""",

    "text_html_extract" -> {
      val htmlSql = """'<html><head><title>' || source || '</title><script type="text/javascript">var v = ' || CAST(doc_id AS VARCHAR) || ';</script><style>p { color: red }</style></head><body><h1>' || source || '</h1><p>' || text || ' &amp; more &lt;tags&gt;</p><a href="/d/' || CAST(doc_id AS VARCHAR) || '">read ' || lang || ' doc</a><div><a href="/next">next</a></div></body></html>'"""
      s"""WITH h AS (SELECT doc_id, $htmlSql AS html FROM documents),
         s AS (SELECT doc_id, html,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(
                 regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                 '<[^>]+>', ' ', 'g'),
               '&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),'&nbsp;',' '),'&amp;','&'),
             '\\s+', ' ', 'g')) AS stripped,
           coalesce(list_sum(list_transform(
             regexp_extract_all(html, '(?is)<a[^>]*>(.*?)</a>', 1),
             x -> length(trim(regexp_replace(regexp_replace(x,'<[^>]+>',' ','g'),'\\s+',' ','g'))))), 0) AS ac
           FROM h)
         SELECT doc_id, stripped,
           (round(CASE WHEN length(stripped) > 0 THEN least(CAST(ac AS DOUBLE)/length(stripped), 1.0) ELSE 0.0 END, 6) + 0) AS link_density
         FROM s ORDER BY doc_id"""
    },

    "text_url_domains" -> {
      val urlSql = """CASE WHEN doc_id % 11 = 0 THEN 'https://[2001:db8::' || CAST(doc_id % 9 AS VARCHAR) || ']:8080/v6/' || CAST(doc_id AS VARCHAR) ELSE 'https://' || (CASE WHEN doc_id % 7 = 0 THEN 'user:pw@' ELSE '' END) || (CASE doc_id % 5 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' ELSE '' END) || source || (CASE doc_id % 4 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com' WHEN 2 THEN '.org' ELSE '.com.au' END) || (CASE WHEN doc_id % 3 = 0 THEN ':8080' ELSE '' END) || (CASE WHEN doc_id % 2 = 0 THEN '/p/' || CAST(doc_id AS VARCHAR) || '?q=' || lang ELSE '' END) END"""
      val suffixes = graft.text.WebText.MultiLabelSuffixes
        .map(s => s"'$s'").mkString(",")
      s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
         a AS (SELECT doc_id, url,
           regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', '') AS na
           FROM u),
         h AS (SELECT doc_id, url,
           CASE WHEN regexp_extract(na, '^\\[([^\\]]*)\\]', 1) <> ''
                THEN lower(regexp_extract(na, '^\\[([^\\]]*)\\]', 1))
                ELSE lower(regexp_extract(na, '^([^:]+)', 1)) END AS host,
           coalesce(nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), ''), '/') AS path
           FROM a)
         SELECT doc_id, host,
           CASE WHEN host = '' OR host IS NULL THEN NULL
             WHEN len(string_split(host,'.')) <= 2 THEN host
             WHEN array_to_string(string_split(host,'.')[-2:],'.') IN ($suffixes)
               THEN array_to_string(string_split(host,'.')[-3:],'.')
             ELSE array_to_string(string_split(host,'.')[-2:],'.') END AS domain,
           path
         FROM h ORDER BY doc_id"""
    },

    "text_url_canonical" -> {
      val urlSql = """'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) || source || '.com' || (CASE doc_id % 4 WHEN 0 THEN '/a/b/' WHEN 1 THEN '/a/b' WHEN 2 THEN '/' ELSE '' END) || (CASE doc_id % 5 WHEN 0 THEN '?utm_source=x&b=2&a=1' WHEN 1 THEN '?a=1&b=2' WHEN 2 THEN '?utm_campaign=y' WHEN 3 THEN '?gclid&a=1' ELSE '' END) || (CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)"""
      s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
         a AS (SELECT doc_id, url,
           regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', '') AS na
           FROM u),
         h AS (SELECT doc_id, url,
           regexp_replace(CASE WHEN regexp_extract(na, '^\\[([^\\]]*)\\]', 1) <> ''
                THEN lower(regexp_extract(na, '^\\[([^\\]]*)\\]', 1))
                ELSE lower(regexp_extract(na, '^([^:]+)', 1)) END, '^www\\.', '') AS host,
           coalesce(nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), ''), '/') AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS qs
           FROM a),
         c AS (SELECT doc_id, url, host,
           CASE WHEN path = '/' THEN '' ELSE regexp_replace(path, '/+$$', '') END AS cpath,
           array_to_string(list_sort(list_filter(string_split(qs, '&'),
             p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=&]*|gclid|fbclid|ref|ref_src|mc_cid|mc_eid)(=|$$)'))), '&') AS cq
           FROM h)
         SELECT doc_id, CASE WHEN host = '' THEN lower(url)
           ELSE host || cpath || (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) END AS canonical
         FROM c ORDER BY doc_id"""
    },

    "text_lexical_diversity" ->
      s"""WITH t AS (SELECT doc_id, list_transform($tokensSql, x -> lower(x)) AS lt FROM documents)
         SELECT doc_id,
           (round(CAST(len(list_distinct(lt)) AS DOUBLE) / len(lt), 6) + 0) AS ttr,
           (round(CAST(len(list_filter(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)) = 1)) AS DOUBLE)
             / len(list_distinct(lt)), 6) + 0) AS hapax_frac
         FROM t ORDER BY doc_id""",

    "emb_vector_audit" ->
      s"""WITH v AS (SELECT embedding,
           CASE WHEN embedding IS NULL THEN NULL
             ELSE len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) > 0 END AS bad,
           CASE WHEN embedding IS NULL THEN NULL
             ELSE sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END AS nrm
         FROM embeddings)
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN embedding IS NULL THEN 1 END) AS BIGINT) AS n_null,
           CAST(count(CASE WHEN embedding IS NOT NULL AND bad THEN 1 END) AS BIGINT) AS n_nonfinite,
           CAST(count(CASE WHEN embedding IS NOT NULL AND NOT bad AND nrm = 0.0 THEN 1 END) AS BIGINT) AS n_zero,
           (round(min(CASE WHEN embedding IS NOT NULL AND NOT bad THEN nrm END), 6) + 0) AS min_norm,
           (round(avg(CASE WHEN embedding IS NOT NULL AND NOT bad THEN nrm END), 6) + 0) AS avg_norm,
           (round(max(CASE WHEN embedding IS NOT NULL AND NOT bad THEN nrm END), 6) + 0) AS max_norm
         FROM v""",

    "events_rolling_zscore" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
         f AS (SELECT event_id, user_id, us, CAST(value AS DOUBLE) AS v,
             CAST(count(*) OVER w AS BIGINT) AS pn,
             avg(value) OVER w AS pm,
             sqrt(greatest(avg(value * value) OVER w - (avg(value) OVER w) * (avg(value) OVER w), 0.0)) AS ps
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
         SELECT event_id, user_id, us AS ts_us, (round(v, 6) + 0) AS value,
           pn AS prior_n, (round(pm, 6) + 0) AS prior_mean, (round(ps, 6) + 0) AS prior_std,
           (CASE WHEN pn >= 2 AND ps > 1e-9 THEN round((v - pm) / ps, 6) + 0 ELSE NULL END) AS z
         FROM f ORDER BY event_id""",

    "events_session_paths" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) AS ns, event_type FROM events),
         g AS (SELECT user_id, ns, event_type,
           CASE WHEN lag(ns) OVER w IS NULL THEN 1
                WHEN ns - lag(ns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ns)),
         s AS (SELECT user_id, ns, event_type,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ns ROWS UNBOUNDED PRECEDING) AS sid FROM g),
         p AS (SELECT array_to_string(list_transform(list_sort(list(struct_pack(t := ns, e := event_type))), x -> struct_extract(x, 'e')), '>') AS path
           FROM s GROUP BY user_id, sid),
         c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1)
         SELECT path, n_sessions FROM c ORDER BY n_sessions DESC, path LIMIT 25""",

    "data_quantile_bins" ->
      s"""WITH r AS (SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS rank FROM documents)
         SELECT doc_id, n_chars, rank,
           CAST((rank * 10) // (SELECT count(*) FROM documents) AS INT) AS bin
         FROM r ORDER BY doc_id""",

    "skew_key_stats" ->
      s"""WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_rows FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k FROM c)
         SELECT key, n_rows,
           (round(CAST(n_rows AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0) AS share,
           (round(CAST(n_rows AS DOUBLE) / (CAST(n AS DOUBLE) / CAST(k AS DOUBLE)), 6) + 0) AS x_uniform
         FROM c, t ORDER BY n_rows DESC, key LIMIT 20""",

    "events_user_features" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
         g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT us // 86400000000) AS BIGINT) AS active_buckets,
             CAST(min(us) AS BIGINT) AS first_us, CAST(max(us) AS BIGINT) AS last_us,
             list_sort(list(us)) AS l FROM e GROUP BY 1),
         g2 AS (SELECT *, list_sort(list_transform(range(1, len(l)), i -> l[i+1] - l[i])) AS gp FROM g)
         SELECT user_id, n_events, active_buckets, first_us, last_us,
           (CASE WHEN len(gp) = 0 THEN NULL
             WHEN len(gp) % 2 = 1 THEN CAST(gp[(len(gp) + 1) // 2] AS DOUBLE)
             ELSE CAST(gp[len(gp) // 2] + gp[len(gp) // 2 + 1] AS DOUBLE) / 2.0 END) AS median_gap_us
         FROM g2 ORDER BY user_id""",

    "text_top_terms_per_cluster" ->
      s"""WITH toks AS (SELECT lang AS c, unnest(list_transform($tokensSql, t -> lower(t))) AS term FROM documents),
         tc AS (SELECT c, term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2),
         ct AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS tok_c FROM tc GROUP BY 1),
         cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cfreq FROM (SELECT DISTINCT c, term FROM tc) GROUP BY 1),
         nc AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS n FROM tc),
         sc AS (SELECT tc.c, tc.term,
             (CAST(tc.cnt AS DOUBLE) / CAST(ct.tok_c AS DOUBLE)) * ln(1.0 + CAST(nc.n AS DOUBLE) / CAST(cf.cfreq AS DOUBLE)) AS score
           FROM tc JOIN ct ON ct.c = tc.c JOIN cf ON cf.term = tc.term, nc),
         r AS (SELECT c, term, score,
             row_number() OVER (PARTITION BY c ORDER BY score DESC, term) AS rank FROM sc)
         SELECT c AS lang, term, (round(score, 6) + 0) AS score, CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 5 ORDER BY lang, rank""",

    "text_vocab_coverage" ->
      s"""WITH allt AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt FROM documents),
         voc AS (SELECT DISTINCT unnest(lt) AS term FROM allt WHERE doc_id < 400),
         tok AS (SELECT doc_id, unnest(lt) AS term FROM allt WHERE doc_id >= 400),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1),
         cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered FROM tok
           WHERE term IN (SELECT term FROM voc) GROUP BY 1)
         SELECT a.doc_id, coalesce(tot.n_tokens, 0) AS n_tokens,
           coalesce(cov.n_covered, 0) AS n_covered,
           (CASE WHEN coalesce(tot.n_tokens, 0) > 0
             THEN round(CAST(coalesce(cov.n_covered, 0) AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE), 6) + 0
             ELSE NULL END) AS coverage
         FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) a
           LEFT JOIN tot ON tot.doc_id = a.doc_id
           LEFT JOIN cov ON cov.doc_id = a.doc_id
         ORDER BY a.doc_id""",

    "dedup_source_overlap" ->
      s"""WITH t AS (SELECT source, $tokensSql AS toks FROM documents),
         ss AS (SELECT DISTINCT source AS src, unnest(list_distinct(${shinglesSql(3)})) AS sh FROM t),
         sz AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY 1),
         sh AS (SELECT a.src AS source_a, b.src AS source_b, CAST(count(*) AS BIGINT) AS shared_shingles
           FROM ss a JOIN ss b ON a.sh = b.sh AND a.src < b.src GROUP BY 1, 2)
         SELECT sh.source_a, sh.source_b, sh.shared_shingles,
           (round(CAST(sh.shared_shingles AS DOUBLE) /
             CAST(za.n + zb.n - sh.shared_shingles AS DOUBLE), 6) + 0) AS jaccard_shingles
         FROM sh JOIN sz za ON za.src = sh.source_a JOIN sz zb ON zb.src = sh.source_b
         ORDER BY 1, 2""",

    "text_kn_ppl" ->
      s"""WITH allt AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt FROM documents),
         trn AS (SELECT * FROM allt WHERE doc_id < 400),
         tst AS (SELECT * FROM allt WHERE doc_id >= 400),
         tbg AS (SELECT lt[i.i+1] AS w1, lt[i.i+2] AS w2 FROM trn, LATERAL (SELECT unnest(range(0, len(lt)-1)) AS i) i WHERE len(lt) >= 2),
         bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM tbg GROUP BY w1, w2),
         hd AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1ph FROM bgc GROUP BY w1),
         ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1pc FROM bgc GROUP BY w2),
         nbb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bgc),
         vn AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM (SELECT unnest(lt) AS term FROM trn)),
         sbg AS (SELECT doc_id, i.i AS pos, lt[i.i+1] AS w1, lt[i.i+2] AS w2 FROM tst, LATERAL (SELECT unnest(range(0, len(lt)-1)) AS i) i WHERE len(lt) >= 2),
         ctb AS (SELECT doc_id, struct_pack(p := pos, c := ln(
             CASE WHEN hd.c1 IS NULL
               THEN (CAST(coalesce(ct.n1pc, 0) AS DOUBLE) + 1.0) / CAST(nbb.nb + vn.v + 1 AS DOUBLE)
               ELSE greatest(CAST(coalesce(bgc.c12, 0) AS DOUBLE) - 0.75, 0.0) / CAST(hd.c1 AS DOUBLE)
                 + 0.75 * CAST(hd.n1ph AS DOUBLE) / CAST(hd.c1 AS DOUBLE)
                   * ((CAST(coalesce(ct.n1pc, 0) AS DOUBLE) + 1.0) / CAST(nbb.nb + vn.v + 1 AS DOUBLE))
             END)) AS pc
           FROM sbg LEFT JOIN bgc ON bgc.w1 = sbg.w1 AND bgc.w2 = sbg.w2
             LEFT JOIN hd ON hd.w1 = sbg.w1 LEFT JOIN ct ON ct.w2 = sbg.w2, nbb, vn),
         sums AS (SELECT doc_id, list_sum(list_transform(list_sort(list(pc)), x -> struct_extract(x, 'c'))) AS s, CAST(count(*) AS BIGINT) AS nb FROM ctb GROUP BY doc_id)
         SELECT t.doc_id, CAST(coalesce(sums.nb, 0) AS BIGINT) AS n_bigrams,
           (CASE WHEN sums.nb > 0 THEN round((0.0 - sums.s) / CAST(sums.nb AS DOUBLE), 6) + 0 ELSE NULL END) AS logppl
         FROM tst t LEFT JOIN sums ON sums.doc_id = t.doc_id ORDER BY t.doc_id""",

    "text_nb_langid" ->
      s"""WITH aug AS (SELECT doc_id, lang,
           text || (CASE WHEN doc_id % 3 != 0 THEN ' tok_' || lang ELSE '' END) AS text
         FROM documents),
         allt AS (SELECT doc_id, lang, list_transform($tokensSql, t -> lower(t)) AS lt FROM aug),
         trn AS (SELECT * FROM allt WHERE doc_id < 400),
         tst AS (SELECT * FROM allt WHERE doc_id >= 400),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM trn),
         cls AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_c FROM trn GROUP BY lang),
         tok AS (SELECT lang, unnest(lt) AS term FROM trn),
         tc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY lang, term),
         tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS t_c FROM tc GROUP BY lang),
         voc AS (SELECT DISTINCT term FROM tok),
         vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
         grid AS (SELECT voc.term, cls.lang,
             ln((CAST(coalesce(tc.cnt, 0) AS DOUBLE) + 1.0) / (CAST(tot.t_c AS DOUBLE) + CAST(vn.v AS DOUBLE))) AS ll
           FROM voc CROSS JOIN cls JOIN tot ON tot.lang = cls.lang LEFT JOIN tc ON tc.term = voc.term AND tc.lang = cls.lang, vn),
         dtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (SELECT doc_id, unnest(lt) AS term FROM tst) GROUP BY doc_id, term),
         ctb AS (SELECT d.doc_id, g.lang, struct_pack(t := d.term, c := CAST(d.tf AS DOUBLE) * g.ll) AS tc2 FROM dtf d JOIN grid g ON g.term = d.term),
         sums AS (SELECT doc_id, lang, list_sum(list_transform(list_sort(list(tc2)), x -> struct_extract(x, 'c'))) AS s
           FROM ctb GROUP BY doc_id, lang),
         scd AS (SELECT t.doc_id, c.lang AS clang,
             ln(CAST(c.n_c AS DOUBLE) / CAST(nn.n AS DOUBLE)) + coalesce(sums.s, 0.0) AS score
           FROM tst t CROSS JOIN cls c LEFT JOIN sums ON sums.doc_id = t.doc_id AND sums.lang = c.lang, nn),
         prd AS (SELECT doc_id, clang AS predicted, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, clang ASC) AS rn FROM scd)
         SELECT t.doc_id, t.lang, p.predicted, (p.predicted = t.lang) AS correct, (round(p.score, 6) + 0) AS score
         FROM prd p JOIN tst t ON t.doc_id = p.doc_id WHERE p.rn = 1 ORDER BY t.doc_id""",

    "knn_graph_exact" ->
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p)
         SELECT qid AS id, bid AS neighbor_id, CAST(rn AS INT) AS rank,
           (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance
         FROM r WHERE rn <= 5 ORDER BY id, rank""",

    "eval_ranking_knn" -> {
      val metricsCtes =
        s"""n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         res AS (SELECT qid, bid AS id, CAST(rn AS INT) AS rank FROM r WHERE rn <= 5),
         l AS (SELECT DISTINCT CAST(a.vec_id AS VARCHAR) AS qid, CAST(b.vec_id AS VARCHAR) AS id
           FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id != b.vec_id
           WHERE a.vec_id < 100 AND b.vec_id < 100),
         nr AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_relevant FROM l GROUP BY 1),
         nret AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_retrieved FROM res GROUP BY 1),
         h AS (SELECT res.qid, res.id, res.rank FROM res JOIN l ON l.qid = res.qid AND l.id = res.id),
         pq AS (SELECT qid, CAST(count(CASE WHEN rank <= 5 THEN 1 END) AS BIGINT) AS hits,
             min(rank) AS fr,
             sum(CASE WHEN rank <= 5 THEN ln(2.0) / ln(CAST(rank AS DOUBLE) + 1.0) ELSE 0.0 END) AS dcg
           FROM h GROUP BY 1),
         m AS (SELECT nr.qid, nr.n_relevant,
             coalesce(nret.n_retrieved, 0) AS n_retrieved,
             coalesce(pq.hits, 0) AS hits_at_k,
             CAST(coalesce(pq.hits, 0) AS DOUBLE) / CAST(nr.n_relevant AS DOUBLE) AS recall_at_k,
             CAST(coalesce(pq.hits, 0) AS DOUBLE) / 5 AS precision_at_k,
             CASE WHEN pq.fr IS NOT NULL THEN 1.0 / CAST(pq.fr AS DOUBLE) ELSE 0.0 END AS mrr,
             coalesce(pq.dcg, 0.0) / list_sum(list_transform(range(1, least(CAST(nr.n_relevant AS INT), 5) + 1),
               i -> ln(2.0) / ln(CAST(i AS DOUBLE) + 1.0))) AS ndcg_at_k
           FROM nr LEFT JOIN nret ON nret.qid = nr.qid LEFT JOIN pq ON pq.qid = nr.qid)"""
      s"""WITH $metricsCtes
         SELECT qid, n_relevant, n_retrieved, hits_at_k,
           (round(recall_at_k, 6) + 0) AS recall_at_k,
           (round(precision_at_k, 6) + 0) AS precision_at_k,
           (round(mrr, 6) + 0) AS mrr, (round(ndcg_at_k, 6) + 0) AS ndcg_at_k
         FROM m ORDER BY qid"""
    },

    "mining_hard_negatives" ->
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         res AS (SELECT qid, bid AS id, CAST(rn AS INT) AS rank FROM r WHERE rn <= 5),
         l AS (SELECT DISTINCT CAST(a.vec_id AS VARCHAR) AS qid, CAST(b.vec_id AS VARCHAR) AS id
           FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id != b.vec_id
           WHERE a.vec_id < 100 AND b.vec_id < 100),
         negs AS (SELECT res.qid, res.id, res.rank FROM res
           WHERE NOT EXISTS (SELECT 1 FROM l WHERE l.qid = res.qid AND l.id = res.id)),
         nn AS (SELECT qid, id, rank,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY rank ASC, id ASC) AS INT) AS neg_rank
           FROM negs)
         SELECT qid, id, rank, neg_rank FROM nn WHERE neg_rank <= 3
         ORDER BY qid, neg_rank""",

    "mining_training_triples" ->
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         res AS (SELECT qid, bid AS id, CAST(rn AS INT) AS rank FROM r WHERE rn <= 5),
         l AS (SELECT DISTINCT CAST(a.vec_id AS VARCHAR) AS qid, CAST(b.vec_id AS VARCHAR) AS id
           FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id != b.vec_id
           WHERE a.vec_id < 100 AND b.vec_id < 100),
         negs AS (SELECT res.qid, res.id, res.rank FROM res
           WHERE NOT EXISTS (SELECT 1 FROM l WHERE l.qid = res.qid AND l.id = res.id)),
         nn AS (SELECT qid, id,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY rank ASC, id ASC) AS INT) AS neg_rank
           FROM negs)
         SELECT l.qid, l.id AS pos_id, nn.id AS neg_id, nn.neg_rank
         FROM l JOIN nn ON nn.qid = l.qid AND nn.neg_rank <= 2
         ORDER BY l.qid, pos_id, neg_rank""",

    "eval_ranking_summary" ->
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         res AS (SELECT qid, bid AS id, CAST(rn AS INT) AS rank FROM r WHERE rn <= 5),
         l AS (SELECT DISTINCT CAST(a.vec_id AS VARCHAR) AS qid, CAST(b.vec_id AS VARCHAR) AS id
           FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id != b.vec_id
           WHERE a.vec_id < 100 AND b.vec_id < 100),
         nr AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_relevant FROM l GROUP BY 1),
         h AS (SELECT res.qid, res.id, res.rank FROM res JOIN l ON l.qid = res.qid AND l.id = res.id),
         pq AS (SELECT qid, CAST(count(CASE WHEN rank <= 5 THEN 1 END) AS BIGINT) AS hits,
             min(rank) AS fr,
             sum(CASE WHEN rank <= 5 THEN ln(2.0) / ln(CAST(rank AS DOUBLE) + 1.0) ELSE 0.0 END) AS dcg
           FROM h GROUP BY 1),
         m AS (SELECT nr.qid,
             CAST(coalesce(pq.hits, 0) AS DOUBLE) / CAST(nr.n_relevant AS DOUBLE) AS rec,
             CAST(coalesce(pq.hits, 0) AS DOUBLE) / 5 AS prec,
             CASE WHEN pq.fr IS NOT NULL THEN 1.0 / CAST(pq.fr AS DOUBLE) ELSE 0.0 END AS mrr,
             coalesce(pq.dcg, 0.0) / list_sum(list_transform(range(1, least(CAST(nr.n_relevant AS INT), 5) + 1),
               i -> ln(2.0) / ln(CAST(i AS DOUBLE) + 1.0))) AS ndcg
           FROM nr LEFT JOIN pq ON pq.qid = nr.qid)
         SELECT CAST(count(*) AS BIGINT) AS n_queries,
           (round(avg(rec), 6) + 0) AS mean_recall,
           (round(avg(prec), 6) + 0) AS mean_precision,
           (round(avg(mrr), 6) + 0) AS mean_mrr,
           (round(avg(ndcg), 6) + 0) AS mean_ndcg
         FROM m""",

    "graph_pagerank_knn" -> {
      val knnEdges =
        s"""n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         e AS (SELECT qid AS src, bid AS dst FROM r WHERE rn <= 5),
         nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM nodes),
         od AS (SELECT src, CAST(count(*) AS BIGINT) AS o FROM e GROUP BY src)"""
      val rounds = (1 to 3).map { t =>
        val prev = s"pr${t - 1}"
        s"""c$t AS (SELECT e.dst AS id, sum($prev.pr / CAST(od.o AS DOUBLE)) AS c
             FROM e JOIN $prev ON $prev.id = e.src JOIN od ON od.src = e.src GROUP BY e.dst),
           d$t AS (SELECT coalesce(sum(pr), 0.0) AS dm FROM $prev WHERE id NOT IN (SELECT src FROM od)),
           pr$t AS (SELECT nodes.id, (1.0 - 0.85) / nn.nd + 0.85 * (coalesce(c$t.c, 0.0) + d$t.dm / nn.nd) AS pr
             FROM nodes LEFT JOIN c$t ON c$t.id = nodes.id, nn, d$t)"""
      }.mkString(",\n         ")
      s"""WITH $knnEdges,
         pr0 AS (SELECT id, 1.0 / nn.nd AS pr FROM nodes, nn),
         $rounds
         SELECT id, (round(pr, 6) + 0) AS pagerank FROM pr3 ORDER BY id"""
    },

    "data_psi_drift_categorical" ->
      s"""WITH r AS (SELECT lang, CAST(count(*) AS BIGINT) AS nr FROM documents WHERE doc_id < 400 GROUP BY 1),
         c AS (SELECT lang, CAST(count(*) AS BIGINT) AS nc FROM documents WHERE doc_id >= 400 GROUP BY 1),
         j AS (SELECT coalesce(r.lang, c.lang) AS category, coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
           FROM r FULL JOIN c ON r.lang = c.lang),
         t AS (SELECT CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc FROM j),
         p AS (SELECT category,
             greatest(CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE), 1e-6) AS pa,
             greatest(CAST(nc AS DOUBLE) / CAST(tc AS DOUBLE), 1e-6) AS pb
           FROM j, t)
         SELECT category, (round(pa, 6) + 0) AS ref_frac, (round(pb, 6) + 0) AS cur_frac,
           (round((pa - pb) * ln(pa / pb), 6) + 0) AS psi_term
         FROM p ORDER BY category""",

    // embedding-space drift: the shared k=8/it=5 recursive-CTE Lloyd's
    // chain (ivfCosKmeansCtes) replicates the trainer, first-min argmin
    // assigns every row, and the cell histograms feed the exact
    // psiCategorical arithmetic (eps floor 1e-6, natural log)
    "data_psi_drift_embedding" ->
      s"""WITH RECURSIVE
         $ivfCosKmeansCtes,
         ar AS (SELECT ${ivfAssign("n.nv", "cents.c")} AS cell FROM n, cents),
         ac AS (SELECT ${ivfAssign("n.nv", "cents.c")} AS cell FROM n, cents
           WHERE n.nv[1] > 0),
         r AS (SELECT cell, CAST(count(*) AS BIGINT) AS nr FROM ar GROUP BY 1),
         c AS (SELECT cell, CAST(count(*) AS BIGINT) AS nc FROM ac GROUP BY 1),
         j AS (SELECT coalesce(r.cell, c.cell) AS cell,
             coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
           FROM r FULL JOIN c ON r.cell = c.cell),
         t AS (SELECT CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc FROM j),
         p AS (SELECT cell,
             greatest(CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE), 1e-6) AS pa,
             greatest(CAST(nc AS DOUBLE) / CAST(tc AS DOUBLE), 1e-6) AS pb
           FROM j, t)
         SELECT CAST(cell AS INT) AS cell, (round(pa, 6) + 0) AS ref_frac,
           (round(pb, 6) + 0) AS cur_frac,
           (round((pa - pb) * ln(pa / pb), 6) + 0) AS psi_term
         FROM p ORDER BY cell""",

    "graph_ppr_knn" -> {
      val tv = "CASE WHEN nodes.id IN ('0', '1', '2') THEN 1.0 / 3.0 ELSE 0.0 END"
      val knnEdges =
        s"""n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         e AS (SELECT qid AS src, bid AS dst FROM r WHERE rn <= 5),
         nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         od AS (SELECT src, CAST(count(*) AS BIGINT) AS o FROM e GROUP BY src)"""
      val rounds = (1 to 3).map { t =>
        val prev = s"pr${t - 1}"
        s"""c$t AS (SELECT e.dst AS id, sum($prev.pr / CAST(od.o AS DOUBLE)) AS c
             FROM e JOIN $prev ON $prev.id = e.src JOIN od ON od.src = e.src GROUP BY e.dst),
           d$t AS (SELECT coalesce(sum(pr), 0.0) AS dm FROM $prev WHERE id NOT IN (SELECT src FROM od)),
           pr$t AS (SELECT nodes.id, (1.0 - 0.85) * ($tv) + 0.85 * (coalesce(c$t.c, 0.0) + d$t.dm * ($tv)) AS pr
             FROM nodes LEFT JOIN c$t ON c$t.id = nodes.id, d$t)"""
      }.mkString(",\n         ")
      s"""WITH $knnEdges,
         pr0 AS (SELECT id, $tv AS pr FROM nodes),
         $rounds
         SELECT id, (round(pr, 6) + 0) AS pagerank FROM pr3 ORDER BY id"""
    },

    "graph_degrees_knn" ->
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p),
         e AS (SELECT qid AS src, bid AS dst FROM r WHERE rn <= 5),
         o AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
         i AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS in_deg FROM e GROUP BY dst)
         SELECT coalesce(o.id, i.id) AS id, coalesce(o.out_deg, 0) AS out_deg,
           coalesce(i.in_deg, 0) AS in_deg
         FROM o FULL JOIN i ON o.id = i.id ORDER BY id""",

    // the SAME oracle: full-probe IVF must reproduce exact bit-for-bit
    "knn_graph_ivf_full" ->
      s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings WHERE vec_id < 100),
         p AS (SELECT a.id AS qid, b.id AS bid,
             list_sum(list_transform(range(1, len(b.nv)+1), i -> CAST(b.nv[i] AS DOUBLE) * CAST(a.nv[i] AS DOUBLE))) AS raw
           FROM n a JOIN n b ON a.id != b.id),
         r AS (SELECT qid, bid, raw,
             row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, bid ASC) AS rn FROM p)
         SELECT qid AS id, bid AS neighbor_id, CAST(rn AS INT) AS rank,
           (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance
         FROM r WHERE rn <= 5 ORDER BY id, rank""",

    "data_temperature_mix" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_g FROM documents GROUP BY lang),
         t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, sum(power(CAST(n_g AS DOUBLE), 0.5)) AS z FROM c),
         r AS (SELECT c.lang, CAST(round(least(1.0, 0.3 * CAST(t.n AS DOUBLE) * (power(CAST(c.n_g AS DOUBLE), 0.5) / t.z) / CAST(c.n_g AS DOUBLE)) * 1000.0, 0) AS INT) AS mix_rate_x1000 FROM c, t)
         SELECT d.doc_id, d.lang, r.mix_rate_x1000
         FROM documents d JOIN r ON r.lang = d.lang
         WHERE CAST(('0x' || substr(md5('graft' || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) < r.mix_rate_x1000
         ORDER BY d.doc_id""",

    "pipeline_curation_lmfilter" ->
      s"""WITH t AS (SELECT doc_id, text, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM documents),
         m AS (SELECT doc_id,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         k AS (SELECT doc_id FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         trn AS (SELECT doc_id, lt FROM t WHERE doc_id < 200),
         tbg AS (SELECT lt[i.i+1] AS w1, lt[i.i+2] AS w2 FROM trn, LATERAL (SELECT unnest(range(0, len(lt)-1)) AS i) i WHERE len(lt) >= 2),
         bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM tbg GROUP BY w1, w2),
         hd AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
         vn AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM (SELECT unnest(lt) AS term FROM trn)),
         tst AS (SELECT t.doc_id, t.lt FROM t JOIN k ON k.doc_id = t.doc_id),
         sbg AS (SELECT doc_id, i.i AS pos, lt[i.i+1] AS w1, lt[i.i+2] AS w2 FROM tst, LATERAL (SELECT unnest(range(0, len(lt)-1)) AS i) i WHERE len(lt) >= 2),
         ctb AS (SELECT doc_id, struct_pack(p := pos, c := ln((CAST(coalesce(bgc.c12, 0) AS DOUBLE) + 1.0) / (CAST(coalesce(hd.c1, 0) AS DOUBLE) + CAST(vn.v AS DOUBLE)))) AS pc
           FROM sbg LEFT JOIN bgc ON bgc.w1 = sbg.w1 AND bgc.w2 = sbg.w2 LEFT JOIN hd ON hd.w1 = sbg.w1, vn),
         sums AS (SELECT doc_id, list_sum(list_transform(list_sort(list(pc)), x -> struct_extract(x, 'c'))) AS s, CAST(count(*) AS BIGINT) AS nb FROM ctb GROUP BY doc_id),
         sc AS (SELECT tst.doc_id, CAST(coalesce(sums.nb, 0) AS BIGINT) AS n_bigrams,
             (0.0 - sums.s) / CAST(sums.nb AS DOUBLE) AS logppl
           FROM tst LEFT JOIN sums ON sums.doc_id = tst.doc_id),
         nn2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc),
         rk AS (SELECT sc.doc_id, sc.logppl, row_number() OVER (ORDER BY sc.logppl, sc.doc_id) - 1 AS seq FROM sc),
         med AS (SELECT rk.logppl AS mthr FROM rk, nn2 WHERE rk.seq = (nn2.n - 1) // 2),
         fl AS (SELECT sc.doc_id, sc.n_bigrams, sc.logppl FROM sc, med WHERE sc.logppl <= med.mthr)
         SELECT doc_id, n_bigrams, (round(logppl, 6) + 0) AS logppl,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
         FROM fl ORDER BY doc_id""",

    "text_bm25_topk" ->
      s"""WITH ${bm25Ctes(Seq("vector", "stream", "window"))}
         SELECT doc_id, dl, (round(score, 6) + 0) AS score FROM bmsc
         WHERE round(score, 6) > 0
         ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10""",

    "dedup_lines_across" ->
      s"""WITH syn AS (SELECT doc_id,
           'header-' || CAST(doc_id % 5 AS VARCHAR) || chr(10) || substr(text, 1, 60)
             || chr(10) || ' ' || chr(10) || 'shared footer line' AS text
         FROM documents),
         sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM syn),
         l AS (SELECT doc_id, i.i AS pos, ls[i.i + 1] AS line
           FROM sp, LATERAL (SELECT unnest(range(0, len(ls))) AS i) i),
         k AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn,
             len(trim(line)) AS tl
           FROM l),
         kept AS (SELECT doc_id, pos, line FROM k WHERE tl < 1 OR rn = 1),
         agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_deduped,
             count(*) AS n_lines_kept
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id, coalesce(a.text_deduped, '') AS text_deduped,
           coalesce(a.n_lines_kept, 0) AS n_lines_kept
         FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    "dedup_repeated_spans" ->
      s"""WITH base0 AS (SELECT doc_id AS id, $tokensSql AS tk0, text FROM documents WHERE doc_id < 100),
         corpus AS (SELECT id,
           CASE WHEN id < 40 THEN text || ' ' || array_to_string(tk0[1:30], ' ') ELSE text END AS text
         FROM base0),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         wins AS (SELECT id, i.i AS pos, md5(array_to_string(toks[(i.i+1):(i.i+20)], ' ')) AS w
           FROM t, LATERAL (SELECT unnest(range(0, len(toks) - 20 + 1)) AS i) i
           WHERE len(toks) >= 20),
         fi AS (SELECT id, w, min(pos) AS fpos, count(*) AS c FROM wins GROUP BY id, w),
         fl AS (SELECT wins.id, list_sort(list(wins.pos)) AS starts
           FROM wins JOIN fi ON fi.id = wins.id AND fi.w = wins.w
           WHERE fi.c >= 2 AND wins.pos > fi.fpos GROUP BY wins.id),
         cl AS (SELECT t.id, len(t.toks) AS nb,
             list_filter(t.toks, (x, i) -> len(list_filter(coalesce(fl.starts, CAST([] AS BIGINT[])), s -> s <= i - 1 AND i - 1 < s + 20)) = 0) AS ck
           FROM t LEFT JOIN fl ON fl.id = t.id)
         SELECT id, CAST(nb AS INT) AS n_tokens_before, CAST(len(ck) AS INT) AS n_tokens_after,
           md5(array_to_string(ck, ' ')) AS clean_md5
         FROM cl ORDER BY id""",

    "dedup_shared_spans" ->
      s"""WITH corpus AS (SELECT doc_id AS id,
           CASE WHEN doc_id < 40 THEN text || ' fz0 fz1 fz2 fz3 fz4 fz5 fz6 fz7 fz8 fz9 fz10 fz11 fz12 fz13 fz14 fz15 fz16 fz17 fz18 fz19 fz20 fz21 fz22 fz23 fz24' ELSE text END AS text
         FROM documents WHERE doc_id < 100),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         wins AS (SELECT id, i.i AS pos, md5(array_to_string(toks[(i.i+1):(i.i+20)], ' ')) AS w
           FROM t, LATERAL (SELECT unnest(range(0, len(toks) - 20 + 1)) AS i) i
           WHERE len(toks) >= 20),
         sh AS (SELECT w FROM (SELECT w, count(DISTINCT id) AS nd FROM wins GROUP BY w) WHERE nd >= 2),
         fl AS (SELECT id, list_sort(list(pos)) AS starts FROM wins JOIN sh USING (w) GROUP BY id),
         cl AS (SELECT t.id, len(t.toks) AS nb,
             list_filter(t.toks, (x, i) -> len(list_filter(coalesce(fl.starts, CAST([] AS BIGINT[])), s -> s <= i - 1 AND i - 1 < s + 20)) = 0) AS ck
           FROM t LEFT JOIN fl ON fl.id = t.id)
         SELECT id, CAST(nb AS INT) AS n_tokens_before, CAST(len(ck) AS INT) AS n_tokens_after,
           md5(array_to_string(ck, ' ')) AS clean_md5
         FROM cl ORDER BY id""",

    // stored-expected fixture (like ann_hnsw_topk): the trained BPE is
    // deterministic — merge ties break lexicographically, the word
    // table is (count desc, word asc) — so the tokenizer's output on
    // the held-out docs is pinned verbatim; BpeSpec's hand-derived
    // classic fixture backs the freeze
    "emb_standardize" ->
      s"""WITH dd AS (SELECT len(embedding) AS dims FROM embeddings LIMIT 1),
         idx AS (SELECT unnest(range(0, (SELECT dims FROM dd))) AS i),
         st AS (SELECT p.i,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(embedding[p.i+1] AS DOUBLE)) AS s,
             sum(CAST(embedding[p.i+1] AS DOUBLE) * CAST(embedding[p.i+1] AS DOUBLE)) AS ss
           FROM idx p, embeddings GROUP BY p.i),
         ms AS (SELECT i, s / CAST(n AS DOUBLE) AS mean,
             sqrt(ss / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS std
           FROM st)
         SELECT CAST(e.vec_id AS INT) AS id, CAST(ms.i AS INT) AS i,
           (round(CASE WHEN ms.std > 0 THEN (CAST(e.embedding[ms.i+1] AS DOUBLE) - ms.mean) / ms.std ELSE 0.0 END, 6) + 0) AS z
         FROM embeddings e, ms WHERE e.vec_id < 50
         ORDER BY id, i""",

    // FixtureRegenSpec recomputes this from a freshly-trained BPE every
    // test run and diffs against [[BpeFixtureSf001]]
    "text_bpe_tokens" -> bpeFixtureSql,

    "text_top_ngrams" ->
      s"""WITH t AS (SELECT list_transform($tokensSql, x -> lower(x)) AS toks FROM documents),
         g AS (SELECT unnest(list_transform(range(0, len(toks) - 3 + 1),
             i -> array_to_string(toks[i+1:i+3], ' '))) AS ngram
           FROM t WHERE len(toks) >= 3),
         c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS freq FROM g GROUP BY ngram)
         SELECT ngram, freq FROM c ORDER BY freq DESC, ngram ASC LIMIT 20""",

    "text_heavy_sources" ->
      s"""SELECT source AS item,
           CAST(sum(len($tokensSql)) AS BIGINT) AS weight
         FROM documents GROUP BY source
         ORDER BY weight DESC, item ASC LIMIT 5""",

    // purge-free regime (capacity >= distinct grams at gate scale):
    // the Misra-Gries summary's counts are exact, so the sketch form
    // shares the exact cut's oracle verbatim
    "text_top_ngrams_sketched" ->
      s"""WITH t AS (SELECT list_transform($tokensSql, x -> lower(x)) AS toks FROM documents),
         g AS (SELECT unnest(list_transform(range(0, len(toks) - 3 + 1),
             i -> array_to_string(toks[i+1:i+3], ' '))) AS ngram
           FROM t WHERE len(toks) >= 3),
         c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS freq FROM g GROUP BY ngram)
         SELECT ngram, freq FROM c ORDER BY freq DESC, ngram ASC LIMIT 20""",

    "emb_linear_probe" ->
      s"""WITH f AS (SELECT vec_id,
           CAST(embedding[1] AS DOUBLE) AS x1,
           CAST(embedding[2] AS DOUBLE) AS x2,
           CAST(embedding[3] AS DOUBLE) AS y FROM embeddings),
         m AS (SELECT sum(x1*x1) + 0.001 AS a11, sum(x1*x2) AS a12,
             sum(x2*x2) + 0.001 AS a22, sum(x1*y) AS b1, sum(x2*y) AS b2
           FROM f),
         w AS (SELECT (a22*b1 - a12*b2) / (a11*a22 - a12*a12) AS w1,
             (a11*b2 - a12*b1) / (a11*a22 - a12*a12) AS w2 FROM m)
         SELECT CAST(f.vec_id AS INT) AS id,
           (round(w.w1 * f.x1 + w.w2 * f.x2, 6) + 0) AS score
         FROM f, w WHERE f.vec_id < 50 ORDER BY id""",

    "text_bm25_search_many" ->
      s"""WITH qt AS (SELECT * FROM (VALUES ('q0','vector'),('q0','stream'),('q0','window'),('q1','spark'),('q1','batch'),('q2','zzznope')) v(qid, term)),
         d AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len(lt)) AS BIGINT) AS sumdl FROM d),
         prs AS (SELECT e.doc_id, e.dl, e.term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, CAST(len(lt) AS BIGINT) AS dl, unnest(lt) AS term FROM d) e
           JOIN (SELECT DISTINCT term FROM qt) q ON q.term = e.term
           GROUP BY e.doc_id, e.dl, e.term),
         dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfv FROM prs GROUP BY term),
         ctb AS (SELECT qt.qid, prs.doc_id, prs.dl, struct_pack(t := prs.term, c :=
             ln((CAST(st.n AS DOUBLE) - CAST(dft.dfv AS DOUBLE) + 0.5) / (CAST(dft.dfv AS DOUBLE) + 0.5) + 1.0)
             * (CAST(prs.tf AS DOUBLE) * (1.2 + 1.0))
             / (CAST(prs.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(prs.dl AS DOUBLE) / (CAST(st.sumdl AS DOUBLE) / CAST(st.n AS DOUBLE))))) AS tc
           FROM prs JOIN dft ON dft.term = prs.term JOIN qt ON qt.term = prs.term, st),
         sc AS (SELECT qid, doc_id, dl, list_sum(list_transform(list_sort(list(tc)), x -> struct_extract(x, 'c'))) AS score
           FROM ctb GROUP BY qid, doc_id, dl),
         rk AS (SELECT qid, doc_id, dl, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id ASC) AS rn
           FROM sc WHERE round(score, 6) > 0)
         SELECT qid, doc_id, dl, (score_r + 0) AS score FROM rk WHERE rn <= 5 ORDER BY qid, rn""",

    "text_bm25_lexicon" ->
      s"""WITH ${bm25Ctes(Seq("vector", "stream", "window"))}
         SELECT doc_id, dl, (round(score, 6) + 0) AS score FROM bmsc
         WHERE round(score, 6) > 0
         ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10""",

    "hybrid_bm25_rrf" ->
      s"""WITH ${bm25Ctes(Seq("vector", "stream", "window"))},
         lex AS (SELECT doc_id, row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS rl
           FROM bmsc WHERE round(score, 6) > 0 QUALIFY rl <= 50),
         q2 AS (SELECT list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS qv FROM embeddings WHERE vec_id = 0),
         n2 AS (SELECT CAST(vec_id AS VARCHAR) AS id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM embeddings),
         sc2 AS (SELECT id, list_sum(list_transform(range(1, len(nv)+1), i -> CAST(nv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) AS raw FROM n2, q2),
         vec AS (SELECT CAST(id AS INT) AS doc_id, row_number() OVER (ORDER BY (1.0 - raw) ASC, id ASC) AS rv
           FROM sc2 QUALIFY rv <= 50),
         f AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id, lex.rl AS rl, vec.rv AS rv
           FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id)
         SELECT doc_id, CAST(rl AS BIGINT) AS rank_lex, CAST(rv AS BIGINT) AS rank_vec,
           (round(coalesce(1.0 / (60.0 + CAST(rl AS DOUBLE)), 0.0) + coalesce(1.0 / (60.0 + CAST(rv AS DOUBLE)), 0.0), 6) + 0) AS rrf_score
         FROM f
         ORDER BY round(coalesce(1.0 / (60.0 + CAST(rl AS DOUBLE)), 0.0) + coalesce(1.0 / (60.0 + CAST(rv AS DOUBLE)), 0.0), 6) DESC, doc_id ASC
         LIMIT 10""",

    "text_pii_redact" -> {
      val Seq(email, phone, ip) = TextAnalysis.piiPatterns.map(_._2)
      val redacted = TextAnalysis.piiPatterns.map(_._2).foldLeft("text")(
        (t, p) => s"regexp_replace($t, '$p', '[PII]', 'g')")
      s"""WITH p AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-' ||
           lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-1234 from 10.0.' ||
           CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
         FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text, '$email')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '$phone')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ipv4,
           md5($redacted) AS redacted_md5
         FROM p ORDER BY doc_id"""
    },

    "data_sequential_ids" ->
      s"""SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
         FROM documents ORDER BY doc_id""",

    "chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         c AS (SELECT doc_id, toks, greatest((len(toks) + 19) // 20, 1) AS nchunks FROM t),
         e AS (SELECT doc_id, md5(array_to_string(toks[(i.i*20+1):(i.i*20+20)], ' ')) AS chunk_md5
           FROM c, LATERAL (SELECT unnest(range(0, c.nchunks)) AS i) i)
         SELECT chunk_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
         FROM e GROUP BY chunk_md5 HAVING count(*) > 1 ORDER BY chunk_md5""",

    "text_chunking" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents WHERE doc_id < 100),
         c AS (SELECT doc_id, toks, greatest((len(toks) - 8 + 31) // 32, 1) AS nchunks FROM t),
         e AS (SELECT doc_id, i.i AS chunk_idx,
             array_to_string(toks[(i.i*32+1):(i.i*32+40)], ' ') AS chunk
           FROM c, LATERAL (SELECT unnest(range(0, c.nchunks)) AS i) i)
         SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, md5(chunk) AS chunk_md5,
           CAST(len(list_filter(string_split(chunk, ' '), t -> t != '')) AS INT) AS n_chunk_tokens
         FROM e ORDER BY doc_id, chunk_idx""",

    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $tokensSql AS toks FROM documents)
         SELECT doc_id, md5(text) AS fp_md5,
           list_min(list_transform(${shinglesSql(3)}, s -> md5(s))) AS fp_shingle
         FROM t ORDER BY doc_id""",

    "text_simhash" ->
      s"""WITH toks AS (SELECT doc_id AS id, unnest($tokensSql) AS tok FROM documents),
         $simhashSql
         SELECT id AS doc_id, simhash FROM sh ORDER BY id""",

    "text_hashing_tf" ->
      s"""WITH t AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt
           FROM documents WHERE doc_id < 64),
         b AS (SELECT doc_id, list_transform(lt,
           t -> CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS INT)) AS bk FROM t),
         v AS (SELECT doc_id, list_transform(range(0, 64),
           i -> len(list_filter(bk, x -> x = i))) AS cnt FROM b)
         SELECT doc_id,
           CAST(len(list_filter(cnt, c -> c > 0)) AS BIGINT) AS tf_nnz,
           (round(sqrt(list_sum(list_transform(cnt, c -> CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))), 6) + 0) AS tf_l2,
           CAST(list_position(cnt, list_max(cnt)) - 1 AS BIGINT) AS tf_argmax
         FROM v ORDER BY doc_id""",

    "dedup_tfvector_cosine" ->
      s"""WITH t AS (SELECT doc_id, list_transform($tokensSql, t -> lower(t)) AS lt
           FROM documents WHERE doc_id < 80),
         b AS (SELECT doc_id, list_transform(lt,
           t -> CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS INT)) AS bk FROM t),
         v AS (SELECT doc_id, list_transform(range(0, 64),
           i -> CAST(len(list_filter(bk, x -> x = i)) AS FLOAT)) AS cv FROM b),
         nn AS (SELECT doc_id, list_transform(cv,
           x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(cv, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv FROM v),
         p AS (SELECT a.doc_id AS id_a, bb.doc_id AS id_b,
           list_sum(list_transform(range(1, len(a.nv)+1),
             i -> CAST(a.nv[i] AS DOUBLE) * CAST(bb.nv[i] AS DOUBLE))) AS cosine
           FROM nn a, nn bb WHERE a.doc_id < bb.doc_id)
         SELECT id_a, id_b, (round(cosine, 6) + 0) AS cosine
         FROM p WHERE cosine >= 0.9 ORDER BY id_a, id_b""",

    "dedup_exact" ->
      s"""WITH corpus AS ($corpusSql)
         SELECT id, min(id) OVER (PARTITION BY md5(text)) AS canonical_id,
           id != min(id) OVER (PARTITION BY md5(text)) AS is_dup
         FROM corpus ORDER BY id""",

    "dedup_minhash_pairs" ->
      s"""WITH corpus AS ($corpusSql),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         shs AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM t),
         sig AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shs),
         bandt AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sig),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bandt a JOIN bandt b ON a.band = b.band AND a.id < b.id),
         ver AS (SELECT id_a, id_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
           FROM cand JOIN shs sa ON sa.id = cand.id_a JOIN shs sb ON sb.id = cand.id_b)
         SELECT id_a, id_b, (round(jaccard, 6) + 0) AS jaccard FROM ver WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

    "dedup_clusters" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         shs AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM t),
         sig AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shs),
         bandt AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sig),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bandt a JOIN bandt b ON a.band = b.band AND a.id < b.id),
         ver AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
             FROM cand JOIN shs sa ON sa.id = cand.id_a JOIN shs sb ON sb.id = cand.id_b)
           WHERE jaccard >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT id, id FROM corpus
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
         SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""",

    "store_snapshot_diff" ->
      s"""WITH b AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 300),
         a AS (SELECT doc_id AS id, CASE WHEN doc_id < 150 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id >= 100 AND doc_id < 400)
         SELECT coalesce(b.id, a.id) AS id,
           CASE WHEN b.id IS NULL THEN 'added' WHEN a.id IS NULL THEN 'removed'
                WHEN a.text != b.text THEN 'changed' END AS status
         FROM b FULL JOIN a ON b.id = a.id
         WHERE (b.id IS NULL OR a.id IS NULL OR a.text != b.text)
         ORDER BY id""",

    "dedup_cluster_histogram" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         shs AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM t),
         sig AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shs),
         bandt AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sig),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bandt a JOIN bandt b ON a.band = b.band AND a.id < b.id),
         ver AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
             FROM cand JOIN shs sa ON sa.id = cand.id_a JOIN shs sb ON sb.id = cand.id_b)
           WHERE jaccard >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT id, id FROM corpus
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(count(*) * cluster_size AS BIGINT) AS n_docs,
           CAST(count(*) * (cluster_size - 1) AS BIGINT) AS n_removable
         FROM cs GROUP BY cluster_size ORDER BY cluster_size""",

    "dedup_exact_canonical" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
         aug AS (SELECT CAST(doc_id AS BIGINT) AS id, text FROM docs
           UNION ALL SELECT doc_id + 50000, text || ' CAFE' || chr(769) || '  TOUCHE' || chr(769) FROM docs
           UNION ALL SELECT doc_id + 60000, text || '  caf' || chr(233) || ' touch' || chr(233) || ' ' FROM docs)
         SELECT md5(trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))) AS canon_md5,
           CAST(count(*) AS BIGINT) AS n_members, min(id) AS canonical_id
         FROM aug GROUP BY 1 ORDER BY canonical_id""",

    "dedup_keep_best" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         t AS (SELECT id, $tokensSql AS toks FROM corpus),
         shs AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM t),
         sig AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shs),
         bandt AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sig),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bandt a JOIN bandt b ON a.band = b.band AND a.id < b.id),
         ver AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
             FROM cand JOIN shs sa ON sa.id = cand.id_a JOIN shs sb ON sb.id = cand.id_b)
           WHERE jaccard >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT id, id FROM corpus
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         scored AS (SELECT corpus.id, lab.cluster_id, CAST(len(corpus.text) AS BIGINT) AS keep_score,
             row_number() OVER (PARTITION BY lab.cluster_id ORDER BY len(corpus.text) DESC, corpus.id ASC) AS rn
           FROM corpus JOIN lab ON lab.id = corpus.id)
         SELECT id, cluster_id, keep_score FROM scored WHERE rn = 1 ORDER BY id""",

    "dedup_semantic_pairs" ->
      s"""WITH RECURSIVE
         $ivfCosKmeansCtes,
         $semDedupCtes
         SELECT id_a, id_b, CAST(cell AS INT) AS cell, (round(cosine, 6) + 0) AS cosine
         FROM sempr WHERE cosine >= 0.9 ORDER BY id_a, id_b""",

    "dedup_semantic_keep" ->
      s"""WITH RECURSIVE
         $ivfCosKmeansCtes,
         $semDedupCtes,
         ver AS (SELECT id_a, id_b FROM sempr WHERE cosine >= 0.9),
         edges AS (SELECT id_a AS src, id_b AS dst FROM ver
           UNION ALL SELECT id_b, id_a FROM ver),
         reach(id, r) AS (
           SELECT id, id FROM semc
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         lab AS (SELECT id, min(r) AS cl FROM reach GROUP BY id)
         SELECT id FROM lab WHERE id = cl ORDER BY id""",

    "dedup_simhash_pairs" ->
      s"""WITH corpus AS ($corpusSql),
         toks AS (SELECT id, unnest($tokensSql) AS tok FROM (SELECT id, text FROM corpus) c),
         $simhashSql,
         banded AS (SELECT id, simhash, unnest([
           '0:' || CAST((simhash >> 0) & 65535 AS VARCHAR),
           '1:' || CAST((simhash >> 16) & 65535 AS VARCHAR),
           '2:' || CAST((simhash >> 32) & 65535 AS VARCHAR),
           '3:' || CAST((simhash >> 48) & 65535 AS VARCHAR)]) AS band FROM sh),
         pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
           FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id)
         SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""",

    // two-sided simhash: fingerprints are per-row, so one chain over
    // the corpus+batch union computes them all; the pair join then
    // splits sides by id range (batch ids all >= 10000)
    "dedup_simhash_against" ->
      s"""WITH corpusx AS ($dedupCorpusSideSql),
         batchx AS ($dedupBatchSideSql),
         corpus AS (SELECT id, text FROM corpusx UNION ALL SELECT id, text FROM batchx),
         toks AS (SELECT id, unnest($tokensSql) AS tok FROM (SELECT id, text FROM corpus) c),
         $simhashSql,
         banded AS (SELECT id, simhash, unnest([
           '0:' || CAST((simhash >> 0) & 65535 AS VARCHAR),
           '1:' || CAST((simhash >> 16) & 65535 AS VARCHAR),
           '2:' || CAST((simhash >> 32) & 65535 AS VARCHAR),
           '3:' || CAST((simhash >> 48) & 65535 AS VARCHAR)]) AS band FROM sh),
         pairs AS (SELECT DISTINCT b.id AS id, c.id AS corpus_id,
             bit_count(xor(b.simhash, c.simhash)) AS hamming
           FROM banded b JOIN banded c ON b.band = c.band AND b.id >= 10000 AND c.id < 10000)
         SELECT id, corpus_id, CAST(hamming AS INT) AS hamming FROM pairs WHERE hamming <= 3 ORDER BY id, corpus_id""",

    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents WHERE doc_id < 60),
         shs AS (SELECT doc_id, list_distinct(${shinglesSql(2)}) AS sh FROM t)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           (round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))), 6) + 0) AS jaccard
         FROM shs a, shs b WHERE a.doc_id < b.doc_id
           AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02
         ORDER BY id_a, id_b""",

    // quality gate -> exact-against -> near-against -> sequential ids,
    // all replicated in ONE SQL chain (the gopher metrics block matches
    // pipeline_curation's, re-keyed to the batch fixture's id column)
    "pipeline_curation_incremental" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 400),
         batch AS (SELECT doc_id AS id, lang, text FROM documents WHERE doc_id >= 400
           UNION ALL SELECT doc_id + 40000, lang, text FROM documents WHERE doc_id < 10
           UNION ALL SELECT doc_id + 50000, lang, text || ' zzextra' FROM documents WHERE doc_id < 30),
         t AS (SELECT id, lang, text, $tokensSql AS toks,
           list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS ls,
           list_transform($tokensSql, t -> lower(t)) AS lt
         FROM batch),
         m AS (SELECT id, lang, text, toks,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(toks) END AS mean_word_len,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks) END AS frac_alpha,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS DOUBLE) / len(toks) END AS frac_symbol,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE) / len(ls) END AS frac_bullet,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) AS DOUBLE) / len(ls) END AS frac_ellipsis,
           CASE WHEN len(ls) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS frac_dup_lines,
           CASE WHEN len(lt) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(lt), d -> len(list_filter(lt, x -> x = d)))) AS DOUBLE) / len(lt) END AS top_token_frac
         FROM t),
         k AS (SELECT id, lang, text, toks FROM m
           WHERE n_words >= 20 AND n_words <= 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND frac_symbol <= 0.1 AND frac_bullet <= 0.9
             AND frac_ellipsis <= 0.3 AND frac_alpha >= 0.8
             AND frac_dup_lines <= 0.3 AND top_token_frac <= 0.2),
         ke AS (SELECT id, lang, toks FROM k
           WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)),
         tc AS (SELECT id, $tokensSql AS toks FROM corpus),
         shc AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM tc),
         sigc AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shc),
         bandc AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sigc),
         shb AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM ke),
         sigb AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shb),
         bandb AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sigb),
         cand AS (SELECT DISTINCT b.id AS id, c.id AS corpus_id FROM bandb b JOIN bandc c ON b.band = c.band),
         matched AS (SELECT DISTINCT cand.id
           FROM cand JOIN shb sa ON sa.id = cand.id JOIN shc sb ON sb.id = cand.corpus_id
           WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5)
         SELECT id, lang, CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS seq_id
         FROM ke WHERE id NOT IN (SELECT id FROM matched) ORDER BY id""",

    "dedup_against_pairs" ->
      s"""WITH corpus AS ($dedupCorpusSideSql),
         batch AS ($dedupBatchSideSql),
         tc AS (SELECT id, $tokensSql AS toks FROM corpus),
         shc AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM tc),
         sigc AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shc),
         bandc AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sigc),
         tb AS (SELECT id, $tokensSql AS toks FROM batch),
         shb AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM tb),
         sigb AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shb),
         bandb AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sigb),
         cand AS (SELECT DISTINCT b.id AS id, c.id AS corpus_id FROM bandb b JOIN bandc c ON b.band = c.band),
         ver AS (SELECT cand.id, cand.corpus_id,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
           FROM cand JOIN shb sa ON sa.id = cand.id JOIN shc sb ON sb.id = cand.corpus_id)
         SELECT id, corpus_id, (round(jaccard, 6) + 0) AS jaccard FROM ver WHERE jaccard >= 0.5 ORDER BY id, corpus_id""",

    "dedup_novel_against" ->
      s"""WITH corpus AS ($dedupCorpusSideSql),
         batch AS ($dedupBatchSideSql),
         tc AS (SELECT id, $tokensSql AS toks FROM corpus),
         shc AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM tc),
         sigc AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shc),
         bandc AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sigc),
         tb AS (SELECT id, $tokensSql AS toks FROM batch),
         shb AS (SELECT id, list_distinct(${shinglesSql(3)}) AS sh FROM tb),
         sigb AS (SELECT id, sh, ${minhashSigSql(8)} AS sig FROM shb),
         bandb AS (SELECT id, unnest(${minhashBandsSql(4, 2)}) AS band FROM sigb),
         cand AS (SELECT DISTINCT b.id AS id, c.id AS corpus_id FROM bandb b JOIN bandc c ON b.band = c.band),
         matched AS (SELECT DISTINCT cand.id
           FROM cand JOIN shb sa ON sa.id = cand.id JOIN shc sb ON sb.id = cand.corpus_id
           WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5)
         SELECT id FROM batch WHERE id NOT IN (SELECT id FROM matched) ORDER BY id""",

    "dedup_embedding_pairs" ->
      s"""WITH n AS (SELECT vec_id AS id,
           list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT)) AS nv
           FROM embeddings WHERE vec_id < 300),
         p AS (SELECT a.id AS id_a, b.id AS id_b,
           list_sum(list_transform(range(1, len(a.nv)+1), i -> CAST(a.nv[i] AS DOUBLE) * CAST(b.nv[i] AS DOUBLE))) AS cosine
           FROM n a, n b WHERE a.id < b.id)
         SELECT id_a, id_b, (round(cosine, 6) + 0) AS cosine FROM p WHERE cosine >= 0.35 ORDER BY id_a, id_b""",

    "mm_decode_meta" ->
      s"""WITH spec AS (SELECT doc_id,
           CAST(8 + doc_id % 24 AS INT) AS width,
           CAST(8 + (doc_id * 3) % 24 AS INT) AS height,
           (doc_id * 31) % 256 AS r, (doc_id * 67) % 256 AS g, (doc_id * 101) % 256 AS b
         FROM documents WHERE doc_id < 100)
         SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
           CAST(r * height * ((width + 1) // 2) AS BIGINT) AS sum_r,
           CAST(g * height * ((width + 1) // 2) AS BIGINT) AS sum_g,
           CAST(b * height * ((width + 1) // 2) AS BIGINT) AS sum_b
         FROM spec ORDER BY doc_id""",

    // replicates the bilinear kernel itself: the fixture is constant
    // vertically (convex vertical weights collapse exactly), so the
    // resized sum = th * sum over destination columns of the
    // horizontally-interpolated two-tone value — exact dyadic doubles
    // throughout (power-of-two target), no float tolerance
    "mm_resize" ->
      s"""WITH spec AS (SELECT doc_id,
           CAST(8 + doc_id % 24 AS INT) AS w,
           CAST(8 + (doc_id * 3) % 24 AS INT) AS h,
           (doc_id * 31) % 256 AS r, (doc_id * 67) % 256 AS g, (doc_id * 101) % 256 AS b,
           (CAST(8 + doc_id % 24 AS INT) + 1) // 2 AS lft
         FROM documents WHERE doc_id < 100),
         px AS (SELECT doc_id, r, g, b, lft, w,
           least(greatest((x + 0.5) * w / 32.0 - 0.5, 0.0), w - 1.0) AS sx
         FROM spec, generate_series(0, 31) AS t(x)),
         wt AS (SELECT doc_id, r, g, b,
           (1 - (sx - floor(sx))) * (CASE WHEN floor(sx) < lft THEN 1 ELSE 0 END)
             + (sx - floor(sx)) * (CASE WHEN least(floor(sx) + 1, w - 1) < lft THEN 1 ELSE 0 END) AS wx
         FROM px),
         sums AS (SELECT doc_id,
           sum(floor(r * wx + 0.5)) AS sr, sum(floor(g * wx + 0.5)) AS sg,
           sum(floor(b * wx + 0.5)) AS sb
         FROM wt GROUP BY doc_id)
         SELECT doc_id, CAST(32 AS INT) AS resized_width, CAST(32 AS INT) AS resized_height,
           CAST(32 * sr AS BIGINT) AS resized_sum_r,
           CAST(32 * sg AS BIGINT) AS resized_sum_g,
           CAST(32 * sb AS BIGINT) AS resized_sum_b
         FROM sums ORDER BY doc_id""",

    "mm_video_frames" ->
      s"""WITH spec AS (SELECT doc_id,
           CAST(8 + doc_id % 8 AS INT) AS width,
           CAST(8 + (doc_id * 3) % 8 AS INT) AS height,
           CAST(2 + doc_id % 5 AS INT) AS n_frames
         FROM documents WHERE doc_id < 60),
         f AS (SELECT doc_id, width, height, n_frames,
           CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
         FROM spec)
         SELECT doc_id, n_frames, frame_idx, width, height,
           CAST(((doc_id * 31 + frame_idx * 7) % 256) * width * height AS BIGINT) AS sum_r,
           CAST(((doc_id * 67 + frame_idx * 11) % 256) * width * height AS BIGINT) AS sum_g,
           CAST(((doc_id * 101 + frame_idx * 13) % 256) * width * height AS BIGINT) AS sum_b
         FROM f ORDER BY doc_id, frame_idx""",

    "mm_decode_audio" ->
      s"""WITH spec AS (SELECT doc_id,
           CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
           CAST(64 + doc_id % 128 AS BIGINT) AS n
         FROM documents WHERE doc_id < 100)
         SELECT doc_id, sample_rate, CAST(1 AS INT) AS channels,
           n AS n_samples,
           CAST(list_sum(list_transform(range(0, n), i ->
             ((doc_id * 31 + i * 17) % 2001) - 1000)) AS BIGINT) AS sum_samples
         FROM spec ORDER BY doc_id""",

    "events_windowed" ->
      s"""WITH e AS (SELECT epoch_ns(ts) // 1000000000 AS sec, event_type, value FROM events)
         SELECT sec - (sec % 3600) AS window_start_epoch, event_type,
           CAST(count(*) AS BIGINT) AS cnt, (round(sum(value), 6) + 0) AS sum_value
         FROM e GROUP BY 1, 2 ORDER BY 1, 2""",

    "data_zorder" -> {
      val terms = (for (ci <- 0 until 2; j <- 0 until 8) yield {
        val src = if (ci == 0) "b1" else "b2"
        s"((($src >> $j) & 1) << ${j * 2 + ci})"
      }).mkString(" | ")
      s"""WITH e AS (SELECT event_id,
           user_id % 256 AS b1,
           ((epoch_ns(ts) // 1000) // 3600000000) % 256 AS b2
         FROM events)
         SELECT event_id, CAST($terms AS BIGINT) AS z FROM e ORDER BY event_id"""
    },

    "events_windowed_sliding" ->
      s"""WITH e AS (SELECT epoch_ns(ts) // 1000000000 AS sec, event_type, value FROM events),
         w AS (SELECT unnest(list_filter(
             list_transform(range(0, 4), i -> (sec - (sec % 900)) - i * 900),
             st -> st > sec - 3600)) AS window_start_epoch,
           event_type, value FROM e)
         SELECT window_start_epoch, event_type,
           CAST(count(*) AS BIGINT) AS cnt, (round(sum(value), 6) + 0) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",

    "events_interval_join" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ns, event_type FROM events),
         v AS (SELECT * FROM e WHERE event_type = 'view'),
         p AS (SELECT * FROM e WHERE event_type = 'purchase')
         SELECT v.user_id, v.event_id AS l_event_id, p.event_id AS r_event_id,
           CAST(p.ns - v.ns AS BIGINT) AS delta_ns
         FROM v JOIN p ON p.user_id = v.user_id
           AND p.ns - v.ns BETWEEN 1 AND 7200000000000
         ORDER BY 1, 2, 3""",

    "events_streaming_interval_join" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ns, event_type FROM events),
         v AS (SELECT * FROM e WHERE event_type = 'view'),
         p AS (SELECT * FROM e WHERE event_type = 'purchase')
         SELECT v.user_id, v.event_id AS l_event_id, p.event_id AS r_event_id,
           CAST(p.ns - v.ns AS BIGINT) AS delta_ns
         FROM v JOIN p ON p.user_id = v.user_id
           AND p.ns - v.ns BETWEEN 1000000000 AND 7200000000000
         ORDER BY 1, 2, 3""",

    "events_session_window" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
         g AS (SELECT user_id, us, value,
           CASE WHEN lag(us) OVER w IS NULL THEN 1
                WHEN us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         s AS (SELECT user_id, us, value,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM g)
         SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           (round(sum(value), 6) + 0) AS session_value
         FROM s GROUP BY user_id, sid ORDER BY 1, 2""",

    "events_sessionize" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) AS ns FROM events),
         g AS (SELECT user_id, ns,
           CASE WHEN lag(ns) OVER w IS NULL THEN 1
                WHEN ns - lag(ns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ns)),
         s AS (SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ns ROWS UNBOUNDED PRECEDING) AS sid FROM g),
         per AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events_total,
           CAST(max(n) AS BIGINT) AS max_session_events
         FROM per GROUP BY user_id ORDER BY user_id""",

    "events_funnel_steps" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
         s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING(user_id)
           WHERE event_type = 'click' AND us > t1 AND us <= t1 + 259200000000 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING(user_id) JOIN s1 USING(user_id)
           WHERE event_type = 'purchase' AND us > t2 AND us <= t1 + 259200000000 GROUP BY 1)
         SELECT s1.user_id, CAST(t1 AS BIGINT) AS step1_us,
           CAST(t2 AS BIGINT) AS step2_us, CAST(t3 AS BIGINT) AS step3_us,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS INT) AS depth
         FROM s1 LEFT JOIN s2 USING(user_id) LEFT JOIN s3 USING(user_id) ORDER BY 1""",

    "events_funnel_trend" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
         s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING(user_id)
           WHERE event_type = 'click' AND us > t1 AND us <= t1 + 259200000000 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING(user_id) JOIN s1 USING(user_id)
           WHERE event_type = 'purchase' AND us > t2 AND us <= t1 + 259200000000 GROUP BY 1),
         f AS (SELECT s1.user_id, t1,
             CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth
           FROM s1 LEFT JOIN s2 USING(user_id) LEFT JOIN s3 USING(user_id))
         SELECT t1 // 86400000000 AS anchor_bucket, CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_users
         FROM f GROUP BY 1, 2 ORDER BY 1, 2""",

    "data_split_balance" ->
      s"""WITH b AS (SELECT doc_id,
           CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) AS bucket
         FROM documents),
         sp AS (SELECT CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split FROM b),
         c AS (SELECT split, CAST(count(*) AS BIGINT) AS n FROM sp GROUP BY 1),
         e AS (SELECT * FROM (VALUES ('train', 0.8), ('val', 0.1), ('test', 0.1)) t(split, ef)),
         tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
         SELECT c.split, c.n, (round(e.ef, 6) + 0) AS expected_frac,
           (round(CAST(c.n AS DOUBLE) / CAST(tt.tot AS DOUBLE), 6) + 0) AS actual_frac,
           (round((CAST(c.n AS DOUBLE) - CAST(tt.tot AS DOUBLE) * e.ef)
             / sqrt(CAST(tt.tot AS DOUBLE) * e.ef * (1.0 - e.ef)), 6) + 0) AS z
         FROM c JOIN e ON e.split = c.split, tt ORDER BY c.split""",

    "emb_dim_histogram" ->
      s"""SELECT coalesce(len(embedding), -1) AS dim, CAST(count(*) AS BIGINT) AS n_rows
         FROM embeddings GROUP BY 1 ORDER BY 1""",

    "data_kfold" ->
      s"""SELECT doc_id,
           CAST(CAST(('0x' || substr(md5('graft' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS INT) % 5 AS INT) AS fold
         FROM documents ORDER BY doc_id""",

    "events_funnel_summary" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
         s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING(user_id)
           WHERE event_type = 'click' AND us > t1 AND us <= t1 + 259200000000 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING(user_id) JOIN s1 USING(user_id)
           WHERE event_type = 'purchase' AND us > t2 AND us <= t1 + 259200000000 GROUP BY 1)
         SELECT * FROM (VALUES
           (1, 'view', (SELECT CAST(count(*) AS BIGINT) FROM s1)),
           (2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)),
           (3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)))
           t(step, step_name, n_users) ORDER BY step""",

    "events_retention_cohorts" ->
      s"""WITH e AS (SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS b FROM events),
         f AS (SELECT user_id, min(b) AS cohort_bucket FROM e GROUP BY 1)
         SELECT cohort_bucket, b - cohort_bucket AS bucket_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN f USING(user_id) GROUP BY 1, 2 ORDER BY 1, 2""",

    "dedup_exact_against_bloom" ->
      s"""WITH corpus AS ($dedupCorpusSideSql), batch AS ($dedupBatchSideSql)
         SELECT id FROM batch
         WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus) ORDER BY id""",

    "events_rolling_stats" ->
      s"""SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
           CAST(count(*) OVER w AS BIGINT) AS roll_n,
           (round(sum(value) OVER w, 6) + 0) AS roll_sum,
           (round(avg(value) OVER w, 6) + 0) AS roll_avg,
           (round(max(value) OVER w, 6) + 0) AS roll_max
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "events_json_extract" ->
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "events_asof_join" ->
      s"""SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
           r.value AS asof_view_value, r.event_id AS asof_view_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",

    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           (round(sum(l_quantity) / count(*), 6) + 0) AS avg_qty,
           CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "join_revenue_by_nation" ->
      s"""SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "join_shipping_priority" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-06-01'
           AND l_shipdate > TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey, orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "skew_salted_agg" ->
      s"""SELECT l_suppkey, sum(l_quantity) AS sum_qty,
           CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",

    "window_top_orders" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""",

    "store_delete_rewrite" ->
      s"""SELECT CAST(vec_id AS VARCHAR) AS id, CAST(3 AS BIGINT) AS deleted
         FROM embeddings WHERE vec_id NOT IN (1, 3, 7) ORDER BY id""",

    "store_roundtrip" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(max(len(embedding)) AS INT) AS dimensions,
           'cosine' AS metric, 'l2' AS normalize,
           'reloaded' AS name, 'similarity' AS score
         FROM embeddings"""
  )
}
