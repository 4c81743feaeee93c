package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric, Normalize, ScoreMode}
import graft.expr.VectorKernels
import graft.functions.VectorFunctions._

/** Search operators over a collection DataFrame.
  *
  * Canonical collection schema (SURVEY §1.3): `id string, value string,
  * vector array<float>, vectors array<array<float>>, binary_vector
  * array<bigint>, metadata map<string,string>` — extra columns pass
  * through untouched.
  *
  * Execution model: every operator is a declarative plan ending in
  * `ORDER BY (rank, id) LIMIT k`, which Catalyst compiles to
  * `TakeOrderedAndProject` — a per-partition bounded heap merged on the
  * driver. That is exactly the reference's top-k algorithm
  * (native/vettore/src/search.rs:50-72) distributed across executors: no
  * full sort, no shuffle of non-winners, scales linearly with partitions.
  * Tie-break by ascending id keeps results fully deterministic
  * (search.rs:23-29).
  */
object Search {

  /** Validate + normalize a query vector exactly like ingest
    * (collection.ex:351-357): dimensions then finiteness then the
    * collection's normalize mode. */
  def prepareQuery(config: CollectionConfig, query: Array[Float]): Array[Float] = {
    require(query.length == config.dimensions,
      s"dimension mismatch: query ${query.length}, collection ${config.dimensions}")
    require(VectorKernels.validateFinite(query), "vector contains a non-finite value")
    val mode = config.effectiveNormalize match {
      case Normalize.None => 0; case Normalize.L2 => 1
      case Normalize.ZScore => 2; case Normalize.MinMax => 3
    }
    VectorKernels.normalize(mode, query)
  }

  /** Ascending-rank column for a raw metric column. */
  private def rankCol(metric: Metric, raw: Column): Column = rankValue(metric, raw)

  /** Deterministic top-k: ORDER BY (rank, id) LIMIT k ->
    * TakeOrderedAndProject. */
  def topK(scored: DataFrame, k: Int, rank: Column = col("rank")): DataFrame =
    // nulls LAST: a NULL rank (e.g. a malformed row that slipped past
    // ingest validation) must never outrank a real score
    scored.orderBy(rank.asc_nulls_last, col("id").asc).limit(k)

  /** Scale-safe INTERMEDIATE top-k. A mid-plan orderBy().limit(k) plans
    * as a full range-partitioned sort of the whole corpus (only a
    * terminal sort-limit becomes TakeOrderedAndProject) — a corpus-wide
    * exchange that dwarfs the candidate cut it feeds at cluster scale.
    * Here: sort each partition locally (no exchange), keep its first k
    * rows (the per-partition record index in monotonically_increasing_id's
    * low 33 bits — nondeterministic, so Catalyst cannot reorder the
    * filter below the sort), then run the terminal-style global cut over
    * the <= k * numPartitions survivors. The global (rank, id) top-k is
    * a subset of the union of per-partition (rank, id) top-k's, so
    * results are identical row-for-row. */
  def candidateCut(df: DataFrame, k: Int, rank: Column = col("rank")): DataFrame =
    topK(df.sortWithinPartitions(rank.asc_nulls_last, col("id").asc)
      .filter(monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) < k),
      k, rank)

  /** Final (score, distance) projection per SURVEY §2.8. */
  def projectResults(df: DataFrame, config: CollectionConfig): DataFrame = {
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    df.select(
      col("id"), col("value"),
      score.cast("double").as("score"),
      dist.cast("double").as("distance"),
      lit(config.metric.name).as("metric"),
      (if (df.columns.contains("metadata")) col("metadata") else lit(null)).as("metadata"))
  }

  /** Exact flat search: scan + score + bounded-heap top-k.
    * (reference: lib/vettore/index/flat.ex + flat.rs:96-124) */
  def flatSearch(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int): DataFrame = {
    require(limit > 0, "limit must be positive")
    val q = prepareQuery(config, query)
    val scored = df.withColumn("raw", vecDistance(config.metric, col("vector"), vecLit(q)))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    projectResults(topK(scored, limit), config)
  }

  /** Exact flat search over the packed-f32 layout: like [[flatSearch]]
    * but scoring `vector_f32` (BinaryType, see Prepare.withPackedVector)
    * with in-place byte reads — bit-identical results, and the parquet
    * scan decodes one binary value per row instead of `dims`
    * repetition-leveled array elements (the scan-side win at 100 TB). */
  def flatSearchPacked(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, packedCol: String = "vector_f32"): DataFrame = {
    require(limit > 0, "limit must be positive")
    require(df.columns.contains(packedCol), s"missing packed column $packedCol")
    val q = prepareQuery(config, query)
    val scored = df.withColumn("raw",
        binaryVecDistance(config.metric, col(packedCol), q))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    projectResults(topK(scored, limit), config)
  }

  /** Range (radius) search — the FAISS `range_search` contract: every
    * row whose result DISTANCE is within `radius`, not a fixed k. A
    * pure scan + codegen'd filter: no heap, no sort, no shuffle — the
    * cheapest possible shape at 100 TB, and unlike top-k it needs no
    * result-count coordination across partitions at all. Unordered by
    * default for exactly that reason (a global sort of an unbounded
    * result set is the one thing that could make this expensive);
    * `limit > 0` adds the deterministic (rank, id) cut via
    * TakeOrderedAndProject when a bound is wanted. */
  def rangeSearch(df: DataFrame, config: CollectionConfig, query: Array[Float],
      radius: Double, limit: Int = 0): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    rangeFiltered(df, config, query, dist => dist <= radius, limit)
  }

  /** Range search thresholded on the result SCORE instead of distance
    * (`score >= minScore`) — the natural form for similarity metrics:
    * cosine `minScore = 0.95` is the "all near-duplicates of this
    * vector" query, inner_product `minScore` the recommender cutoff. */
  def rangeSearchByScore(df: DataFrame, config: CollectionConfig,
      query: Array[Float], minScore: Double, limit: Int = 0): DataFrame =
    rangeFiltered(df, config, query, _ => lit(true), limit,
      scorePred = Some(sc => sc >= minScore))

  private def rangeFiltered(df: DataFrame, config: CollectionConfig,
      query: Array[Float], distPred: Column => Column, limit: Int,
      scorePred: Option[Column => Column] = None): DataFrame = {
    val q = prepareQuery(config, query)
    val scored = df.withColumn("raw", vecDistance(config.metric, col("vector"), vecLit(q)))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    val filtered = scorePred match {
      case Some(p) => scored.filter(p(score.cast("double")))
      case None => scored.filter(distPred(dist.cast("double")))
    }
    val cut = if (limit > 0) topK(filtered, limit) else filtered
    projectResults(cut, config)
  }

  /** Batch range search: all queries against the corpus in ONE scan
    * (queries broadcast), `distance <= radius` — or `score >=
    * minScore` when `byScore` — per (qid, id). Emits only matches, so
    * the output is the join's selectivity, never |corpus| x |queries|. */
  def rangeSearchMany(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, radius: Double, byScore: Boolean = false): DataFrame = {
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val scored = df.crossJoin(broadcast(qNorm))
      .withColumn("raw", vecDistance(config.metric, col("vector"), col("qvector")))
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    scored
      .filter(if (byScore) score.cast("double") >= radius
              else dist.cast("double") <= radius)
      .select(col("qid"), col("id"), col("value"),
        score.cast("double").as("score"), dist.cast("double").as("distance"),
        lit(config.metric.name).as("metric"))
  }

  /** Candidate frame for one funnel stage: score the `d`-prefix of the
    * stored vectors against the `d`-prefix of the query. Cosine uses the
    * true normalized cosine because prefixes of unit vectors are not unit
    * (search.rs:56-59); other metrics use their own kernel on the prefix. */
  /** Survivor-id set for one funnel stage, computed EAGERLY on a SLIM
    * (id, rank) projection. Running the cut over the full rows puts the
    * corpus VECTORS through the per-partition sort and a keep*P-row
    * sort-exchange (~KB/row: r10's 5.6x synth_funnel regression, and a
    * scale-killer at 100 TB where every exchange would carry the
    * embedding payload); a lazy broadcast-semi-join variant instead
    * nests each stage's sub-plan inside the next stage's broadcast
    * build, tripling planning and job count per query. Here the cut is
    * a TERMINAL slim top-k — TakeOrderedAndProject's per-partition
    * bounded heap + driver merge, the same shape as flat search's own
    * top-k — and survivors re-enter the plan as an id InSet literal:
    * flat plans, one job per stage, vectors never leave the scan.
    * Driver bound: <= min(64, P) * keep slim (id, rank) pairs — above
    * 64 partitions the locally-cut survivors funnel through a 64-way
    * exchange of slim pairs first, so the driver merge never scales
    * with corpus partition count. */
  private def funnelStageTopIds(df: DataFrame, config: CollectionConfig,
      q: Array[Float], d: Int, keep: Int): Array[String] = {
    val qPrefix = q.slice(0, d)
    val vPrefix = if (d >= config.dimensions) col("vector") else slice(col("vector"), 1, d)
    val raw =
      if (config.metric == Metric.Cosine) trueCosine(vPrefix, vecLit(qPrefix))
      else vecDistance(config.metric, vPrefix, vecLit(qPrefix))
    slimTopIds(df, rankCol(config.metric, raw), keep)
  }

  /** Top-`keep` ids by ascending (`rank`, id), decided on a slim
    * (id, rank) projection — the shared candidate-cut shape (see
    * [[funnelStageTopIds]] for why payload columns must never enter
    * the sort). Terminal TakeOrderedAndProject = per-partition bounded
    * heap + driver merge of slim pairs; above 64 partitions the
    * locally-cut survivors funnel through a 64-way exchange first so
    * the driver merge never scales with corpus partition count. */
  private[graft] def slimTopIds(df: DataFrame, rank: Column, keep: Int): Array[String] = {
    val slim = df.select(col("id"), rank.as("rank"))
    val fanned =
      if (df.rdd.getNumPartitions > 64)
        slim.sortWithinPartitions(col("rank").asc_nulls_last, col("id").asc)
          .filter(monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) < keep)
          .repartition(64)
      else slim
    topK(fanned, keep).select("id").collect().map(_.getString(0))
  }

  /** Survivors as a flat InSet probe over the input — keeps every stage
    * plan shallow instead of chaining semi-joins. Built as a single
    * catalyst InSet node holding the id set: `isInCollection` expands
    * to one Literal PER ID (12800 tree nodes at the default funnel
    * operating point), and analyzing/serializing that tree costs more
    * than the stage's distance job. */
  private[graft] def filterByIds(df: DataFrame, ids: Array[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.InSet
    import org.apache.spark.unsafe.types.UTF8String
    val hset: Set[Any] = ids.iterator.map(UTF8String.fromString(_): Any).toSet
    df.filter(org.apache.spark.sql.graft.Bridge.column(
      InSet(org.apache.spark.sql.graft.Bridge.expression(col("id")), hset)))
  }

  /** Default funnel stages `[d/4, d/2, d]` — the reference's bench
    * defaults (bench/search_modes_bench.exs:262-266), deduplicated. */
  def defaultFunnelStages(dims: Int): Seq[Int] =
    Seq(math.max(dims / 4, 1), math.max(dims / 2, 1), dims).distinct

  /** Per-stage keep counts: the LAST stage keeps `candidates`, each
    * earlier stage keeps `widen`x more. With equal keeps at every stage
    * (the reference's literal semantics, widen=1) a multi-stage funnel
    * degenerates to its FIRST cut: stage 2 receives exactly `candidates`
    * rows and "cuts" them to `candidates`, a no-op — so recall is that
    * of the smallest prefix alone, and extra stages only cost time.
    * Widening makes the funnel an actual funnel: the cheap small-prefix
    * stage over-collects, later (more exact) stages narrow. */
  private[graft] def funnelKeeps(nStages: Int, candidates: Int, widen: Int): Seq[Int] =
    (0 until nStages).map(i =>
      (candidates.toLong * math.pow(widen, (nStages - 1 - i).toDouble).toLong)
        .min(Int.MaxValue).toInt)

  /** Matryoshka funnel search: successive prefix-scored candidate cuts,
    * then exact rerank on full vectors (collection.ex:233-260,674-691).
    * Default stages `[d/4, d/2, d]`, candidates `max(20*limit, limit)`
    * — the reference bench's `min(records, 20*limit)` operating point
    * (bench/search_modes_bench.exs:8-14; the cut caps at corpus size);
    * stage i keeps `candidates * widen^(stagesAfter)` rows (see
    * [[funnelKeeps]]) — `widen = 1` recovers the reference's literal
    * fixed-candidates semantics. */
  def funnelSearch(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, stages: Seq[Int] = Nil, candidates: Int = 0,
      widen: Int = 8): DataFrame = {
    val q = prepareQuery(config, query)
    val effStages = if (stages.nonEmpty) stages else defaultFunnelStages(config.dimensions)
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    require(widen >= 1, "widen must be >= 1")
    val keeps = funnelKeeps(effStages.size, effCand, widen)
    val ids = funnelSurvivorIds(df, config, q, effStages, keeps)
    flatSearchPrepared(ids.fold(df)(filterByIds(df, _)), config, q, limit)
  }

  /** Survivor ids of the staged funnel. Ids thread through as arrays:
    * each stage filters the ORIGINAL frame by the latest id set
    * (equivalent to chaining, one probe instead of a probe per ancestor
    * stage), and a stage whose keep already covers the survivor count
    * is an identity cut — skip its job entirely (candidates >= corpus
    * makes every stage a no-op and the funnel degenerates to exact flat
    * search, the equivalence property SearchSpec pins). None = no stage
    * ran (every cut was an identity) — the candidate set is the whole
    * frame. */
  private def funnelSurvivorIds(df: DataFrame, config: CollectionConfig,
      q: Array[Float], stages: Seq[Int], keeps: Seq[Int]): Option[Array[String]] = {
    var ids: Option[Array[String]] = None
    for ((d, keep) <- stages.zip(keeps) if ids.forall(_.length > keep)) {
      val cur = ids.fold(df)(filterByIds(df, _))
      ids = Some(funnelStageTopIds(cur, config, q, d, keep))
    }
    ids
  }

  /** Exact rerank over an already-prepared query — shared by the
    * candidate-generator searches (funnel/quantized/hybrid/SQ8/PQ). */
  private[graft] def rerankExact(df: DataFrame, config: CollectionConfig,
      q: Array[Float], limit: Int): DataFrame =
    flatSearchPrepared(df, config, q, limit)

  /** Exact rerank used by funnel/quantized/hybrid (query already prepared). */
  private def flatSearchPrepared(df: DataFrame, config: CollectionConfig,
      q: Array[Float], limit: Int): DataFrame = {
    val scored = df.withColumn("raw", vecDistance(config.metric, col("vector"), vecLit(q)))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    projectResults(topK(scored, limit), config)
  }

  /** Binary-quantized search: sign-bit candidate pass, then exact rerank
    * (collection.ex:263-295,693-728). Stored `binary_vector` is used when
    * present, else packed on the fly. The default candidate scorer is the
    * ASYMMETRIC binary dot (full-precision query vs stored signs — see
    * VectorKernels.packedAsymmetricDot for the measured recall win);
    * `asymmetric = false` recovers the reference's literal symmetric
    * packed-Hamming pass (distances.rs:426-437). Both read the same
    * packed words; the final top-k is always an exact rerank, and with
    * candidates >= corpus size either scorer reproduces exact flat. */
  def quantizedSearch(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, candidates: Int = 0, asymmetric: Boolean = true): DataFrame = {
    val q = prepareQuery(config, query)
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    projectResults(topK(quantizedCandidates(df, config, q, effCand, asymmetric)
      .withColumn("raw", vecDistance(config.metric, col("vector"), vecLit(q)))
      .withColumn("rank", rankCol(config.metric, col("raw"))), limit), config)
  }

  private def quantizedCandidates(df: DataFrame, config: CollectionConfig,
      q: Array[Float], keep: Int, asymmetric: Boolean = true): DataFrame =
    filterByIds(df, quantizedCandidateIds(df, config, q, keep, asymmetric))

  private def quantizedCandidateIds(df: DataFrame, config: CollectionConfig,
      q: Array[Float], keep: Int, asymmetric: Boolean = true): Array[String] = {
    val stored =
      if (df.columns.contains("binary_vector"))
        coalesce(col("binary_vector"), packSignBits(col("vector")))
      else packSignBits(col("vector"))
    // the asymmetric proxy follows the metric's rank direction: every
    // metric wants direction-similar candidates (high dot) EXCEPT
    // negative_inner_product, whose exact top-k is the most-opposite
    // direction — there high-asym candidates would exclude the true
    // winners (the symmetric Hamming mode keeps the reference's literal
    // sign-similarity semantics for every metric)
    val rank =
      if (!asymmetric)
        packedHamming(stored, typedlit(VectorKernels.packSignBits(q)), config.dimensions)
      else if (config.metric == Metric.NegativeInnerProduct)
        packedAsymmetricDot(stored, vecLit(q))
      else -packedAsymmetricDot(stored, vecLit(q))
    // slim (id, proxy-rank) cut, like the funnel stages: the packed-bit
    // scan never sorts the full-precision rows it is there to avoid
    // reading
    slimTopIds(df, rank, keep)
  }

  /** ColBERT/MaxSim multi-vector search (collection.ex:298-323). Records
    * fall back to `[vector]` when `vectors` is absent; score is the MaxSim
    * sum (descending), distance is null. Optional per-query metric
    * override (collection.ex:313-323). */
  def multiVectorSearch(df: DataFrame, config: CollectionConfig,
      queryVectors: Seq[Array[Float]], limit: Int,
      metricOverride: Option[Metric] = None): DataFrame = {
    val metric = metricOverride.getOrElse(config.metric)
    queryVectors.foreach { v =>
      require(v.length == config.dimensions, "dimension mismatch")
      require(VectorKernels.validateFinite(v), "vector contains a non-finite value")
    }
    val prepared = queryVectors.map(prepareQuery(config, _)).toArray
    val docVecs =
      if (df.columns.contains("vectors"))
        coalesce(col("vectors"), array(col("vector")))
      else array(col("vector"))
    val scored = df.withColumn("score", maxSim(metric, typedlit(prepared), docVecs))
    scored.orderBy(col("score").desc, col("id").asc).limit(limit)
      .select(col("id"), col("value"), col("score").cast("double").as("score"),
        lit(null).cast("double").as("distance"), lit(metric.name).as("metric"),
        (if (df.columns.contains("metadata")) col("metadata") else lit(null)).as("metadata"))
  }

  /** Hybrid search: run candidate generators, union + dedup by id, then
    * rerank exactly or by MaxSim (collection.ex:326-348,516-658).
    * Generators: "funnel", "quantized", "search" (= flat candidates). */
  def hybridSearch(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, generators: Seq[String] = Seq("funnel", "quantized"),
      candidates: Int = 0, stages: Seq[Int] = Nil,
      rerankMultiVector: Option[Seq[Array[Float]]] = None,
      widen: Int = 8, asymmetric: Boolean = true): DataFrame = {
    val q = prepareQuery(config, query)
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    val effStages = if (stages.nonEmpty) stages else defaultFunnelStages(config.dimensions)
    // every generator reduces to a candidate ID SET (slim cuts — see
    // funnelStageTopIds); the union-with-first-seen-dedup of identical
    // corpus rows IS set union, so the old frame-union + dropDuplicates
    // shuffle collapses into one InSet probe feeding a single rerank
    // scan. None = a generator whose every cut was an identity (keep >=
    // corpus): its candidate set is the whole frame, so the union is too
    val idSets: Seq[Option[Array[String]]] = generators.map {
      case "funnel" =>
        funnelSurvivorIds(df, config, q, effStages,
          funnelKeeps(effStages.size, effCand, widen))
      case "quantized" =>
        Some(quantizedCandidateIds(df, config, q, effCand, asymmetric))
      case "search" | "flat" =>
        Some(slimTopIds(df,
          rankCol(config.metric, vecDistance(config.metric, col("vector"), vecLit(q))),
          effCand))
      case g => throw new IllegalArgumentException(s"unknown generator $g")
    }
    val union =
      if (idSets.exists(_.isEmpty)) df
      else filterByIds(df, idSets.flatMap(_.get).distinct.toArray)
    rerankMultiVector match {
      case Some(qvecs) => multiVectorSearch(union, config, qvecs, limit)
      case None        => flatSearchPrepared(union, config, q, limit)
    }
  }

  /** Broadcast-or-shuffle hint for query-side ADC tables: a broadcast
    * row carries m*k (or dims*256) doubles, so the bound is on total
    * TABLE CELLS, not rows — `spark.graft.adc.broadcastMaxCells`
    * (default 32M cells = 256 MB of f64). Above the bound the join
    * falls back to a shuffle (same rows, bounded executor/driver
    * memory) — the residual batch path multiplies rows by nprobe, which
    * is exactly where an unguarded broadcast would blow up first. */
  private[graft] def adcBroadcastHint(df: DataFrame,
      estCells: Long): DataFrame => DataFrame = {
    val maxCells = df.sparkSession.conf
      .getOption("spark.graft.adc.broadcastMaxCells").map(_.toLong)
      .getOrElse(32000000L)
    if (estCells < 0 || estCells <= maxCells) broadcast(_) else identity
  }

  /** Batch form of flat search: one shuffle-free pass answers many queries
    * at once. `queries` must have (qid, qvector) and is broadcast; results
    * carry qid. This is the shape that scales on a cluster — per-query
    * driver jobs do not. */
  def flatSearchMany(df: DataFrame, config: CollectionConfig, queries: DataFrame,
      limit: Int): DataFrame = {
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val scored = df.crossJoin(broadcast(qNorm))
      .withColumn("raw", vecDistance(config.metric, col("vector"), col("qvector")))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    val w = Window.partitionBy(col("qid")).orderBy(col("rank").asc_nulls_last, col("id").asc)
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= limit)
      .select(col("qid"), col("id"), col("value"),
        score.cast("double").as("score"), dist.cast("double").as("distance"),
        lit(config.metric.name).as("metric"))
  }

  /** Batch form of quantized search: the candidate pass scores the
    * stored sign words against every query in ONE scan (queries
    * broadcast with their prepared vectors; asymmetric binary dot by
    * default, metric direction per [[quantizedSearch]]), the per-query
    * candidate cut rides row_number's map-side WindowGroupLimit, and
    * the exact rerank is the shared bounded-broadcast tail. The scan
    * reads only (id, binary_vector) — dims/8 bytes per row instead of
    * 4*dims — so at 100 TB the candidate stage moves ~32x less data
    * than flat batch search over the same corpus. */
  def quantizedSearchMany(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int, candidates: Int = 0,
      asymmetric: Boolean = true, knownNq: Long = -1L): DataFrame = {
    require(limit > 0, "limit must be positive")
    val effCand = math.max(if (candidates > 0) candidates else 20 * limit, limit)
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    // bits-ONLY candidate scan: when the stored `binary_vector` exists
    // (canonical collections always derive it at ingest) the scan must
    // not also decode `vector` — a coalesce fallback would drag the
    // full f32 column through the widest stage and erase the 32x
    // narrow-scan advantage. A row with a NULL stored binary_vector
    // (non-canonical input) ranks null and sorts LAST, i.e. it is
    // excluded from candidates rather than silently promoted.
    val bitsScan =
      if (df.columns.contains("binary_vector"))
        df.select(col("id"), col("binary_vector").as("_bits"))
      else df.select(col("id"), packSignBits(col("vector")).as("_bits"))
    val qSide =
      if (asymmetric) qNorm
      else qNorm.withColumn("qbits", packSignBits(col("qvector")))
    val rank =
      if (!asymmetric) packedHamming(col("_bits"), col("qbits"), config.dimensions)
      else if (config.metric == Metric.NegativeInnerProduct)
        packedAsymmetricDot(col("_bits"), col("qvector"))
      else -packedAsymmetricDot(col("_bits"), col("qvector"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("_qrank").asc_nulls_last, col("id").asc)
    val cands = bitsScan
      .crossJoin(broadcast(qSide))
      .withColumn("_qrank", rank)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= effCand)
      .select("qid", "id")
    rerankManyExact(df, config, cands, qNorm, limit,
      perQueryBound = effCand, knownNq = knownNq)
  }

  /** Exact batch rerank over (qid, id) candidate pairs — the shared tail
    * of the quantized batch searches. For bounded batches the survivor
    * set (<= nq * candidates rows) is BROADCAST back onto the corpus and
    * queries are broadcast for their vectors, so the corpus vector column
    * never rides a shuffle; the final per-query top-k is one row_number
    * window over the bounded survivors. A 1M-query batch at
    * candidates=100 would be a 100M-row broadcast, so when the caller's
    * `perQueryBound` (candidates per query) times the query count exceeds
    * `spark.graft.rerank.broadcastMaxRows` (default 4M) the survivor and
    * query joins fall back to shuffle hash joins instead — same rows,
    * bounded memory. `queries` must carry (qid, qvector) already
    * normalized. */
  private[graft] def rerankManyExact(df: DataFrame, config: CollectionConfig,
      candidates: DataFrame, queries: DataFrame, limit: Int,
      perQueryBound: Int = 0, knownNq: Long = -1L): DataFrame = {
    val maxBroadcast = df.sparkSession.conf
      .getOption("spark.graft.rerank.broadcastMaxRows").map(_.toLong)
      .getOrElse(4000000L)
    // a caller that knows its batch size passes it; otherwise the
    // query-side count is a tiny job (nq rows) — the corpus is untouched
    val nq = if (knownNq >= 0) knownNq
             else if (perQueryBound > 0) queries.count() else -1L
    val bound = if (perQueryBound > 0 && nq >= 0) nq * perQueryBound else -1L
    val hint: DataFrame => DataFrame =
      if (bound < 0 || bound <= maxBroadcast) broadcast(_) else identity
    val joined = df.select(col("id"), col("value"), col("vector"))
      .join(hint(candidates.select("qid", "id")), Seq("id"))
      .join(hint(queries.select("qid", "qvector")), Seq("qid"))
      .withColumn("raw", vecDistance(config.metric, col("vector"), col("qvector")))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    val w = Window.partitionBy(col("qid")).orderBy(col("rank").asc_nulls_last, col("id").asc)
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= limit)
      .select(col("qid"), col("id"), col("value"),
        score.cast("double").as("score"), dist.cast("double").as("distance"),
        lit(config.metric.name).as("metric"))
  }
}
