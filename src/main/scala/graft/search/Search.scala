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

  /** Exact cursor pagination over the flat rank contract: the page of
    * `limit` rows strictly AFTER `(afterDistance, afterId)` in the
    * (rank, id) total order — the `search_after` every serving layer
    * needs for deep result sets, without OFFSET's scan-and-discard.
    * The cursor is the LAST ROW OF THE PREVIOUS PAGE exactly as
    * returned: `distance` equals the rank value numerically for every
    * metric (cosine 1-raw, IP -raw, everything else raw — see
    * [[graft.core.Metric.rankValue]] vs ScoreMode.resultValues), so
    * (distance, id) IS the rank cursor. Deterministic because the rank
    * recomputes identically per page and (rank, id) is a strict total
    * order; pages tile the full ranking with no gaps or repeats even
    * across rank ties (id ascends within a tie). Unscorable rows
    * (NULL vector/rank) never paginate — same contract as the batch
    * forms. Scale shape: identical to [[flatSearch]] — the cursor
    * predicate is one codegen comparison under the scan, then the
    * bounded-heap cut; page depth costs nothing extra. */
  def flatSearchAfter(df: DataFrame, config: CollectionConfig,
      query: Array[Float], limit: Int, afterDistance: Double,
      afterId: Any): DataFrame = {
    require(limit > 0, "limit must be positive")
    val q = prepareQuery(config, query)
    val scored = df.withColumn("raw", vecDistance(config.metric, col("vector"), vecLit(q)))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    val after = scored.filter(col("rank") > lit(afterDistance) ||
      (col("rank") === lit(afterDistance) && col("id") > lit(afterId)))
    projectResults(topK(after, limit), config)
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

  /** Exact flat search over the bf16-packed layout (see
    * Prepare.withBf16Vector): the top-k over the bf16-ROUNDED corpus —
    * deterministic and near-identical to f32 ranking (bf16 keeps f32's
    * exponent range; Bench pins the measured overlap), at HALF
    * [[flatSearchPacked]]'s scan bytes. The parquet scan decodes one
    * 2*dims-byte binary per row; scoring decodes bf16 in place. */
  def flatSearchBf16(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, packedCol: String = "vector_bf16"): DataFrame = {
    require(limit > 0, "limit must be positive")
    require(df.columns.contains(packedCol), s"missing bf16 column $packedCol")
    val q = prepareQuery(config, query)
    val scored = df.withColumn("raw",
        bf16VecDistance(config.metric, col(packedCol), q))
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
      queries: DataFrame, radius: Double, byScore: Boolean = false,
      knownNq: Long = -1L): DataFrame = {
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val nq = if (knownNq >= 0) knownNq else queries.count()
    queryBlocks(qNorm, nq, config.dimensions).map { qb =>
      val scored = df.crossJoin(broadcast(qb))
        .withColumn("raw", vecDistance(config.metric, col("vector"), col("qvector")))
      val (score, dist) = resultValues(config.metric, col("raw"), config.score)
      scored
        .filter(if (byScore) score.cast("double") >= radius
                else dist.cast("double") <= radius)
        .select(col("qid"), col("id"), col("value"),
          score.cast("double").as("score"), dist.cast("double").as("distance"),
          lit(config.metric.name).as("metric"))
    }.reduce(_ unionByName _)
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
  private def funnelStageRank(config: CollectionConfig, q: Array[Float],
      d: Int): Column = {
    val qPrefix = q.slice(0, d)
    val vPrefix = if (d >= config.dimensions) col("vector") else slice(col("vector"), 1, d)
    val raw =
      if (config.metric == Metric.Cosine) trueCosine(vPrefix, vecLit(qPrefix))
      else vecDistance(config.metric, vPrefix, vecLit(qPrefix))
    rankCol(config.metric, raw)
  }

  /** Top-`keep` ids by ascending (`rank`, id), decided on a slim
    * (id, rank) projection — the shared candidate-cut shape (see
    * [[funnelStageTopIds]] for why payload columns must never enter
    * the sort). Terminal TakeOrderedAndProject = per-partition bounded
    * heap + driver merge of slim pairs; above 64 partitions the
    * locally-cut survivors funnel through a 64-way exchange first so
    * the driver merge never scales with corpus partition count. */
  /** Driver-collect bound for the slim candidate cuts
    * (`spark.graft.slimcut.maxIds`, default 100k ids): a cut whose keep
    * exceeds it must NOT collect — `funnelSearch(candidates = 5M)` would
    * otherwise pull 5M ids to the driver and build a 5M-element InSet.
    * Above the bound the callers switch to [[slimTopIdsFrame]] + a
    * left-semi join: same result set, everything stays distributed. */
  private[graft] def slimCutMaxIds(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.graft.slimcut.maxIds")
      .map(_.toInt).getOrElse(100000)

  private[graft] def slimTopIds(df: DataFrame, rank: Column, keep: Int,
      numPartitions: Int = -1): Array[Any] = {
    val slim = df.select(col("id"), rank.as("rank"))
    val parts = if (numPartitions >= 0) numPartitions else df.rdd.getNumPartitions
    val fanned =
      if (parts > 64)
        slim.sortWithinPartitions(col("rank").asc_nulls_last, col("id").asc)
          .filter(monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) < keep)
          .repartition(64)
      else slim
    topK(fanned, keep).select("id").collect().map(_.get(0))
  }

  /** Distributed form of the slim cut — the top-`keep` ids as a one-column
    * FRAME (per-partition local sort-cut, then the terminal slim top-k;
    * see [[candidateCut]]): the fallback shape when `keep` exceeds
    * [[slimCutMaxIds]] and a driver collect is off the table. Survivors
    * rematerialize via `probe.join(frame, "id", "left_semi")`. */
  private[graft] def slimTopIdsFrame(df: DataFrame, rank: Column, keep: Int): DataFrame =
    candidateCut(df.select(col("id"), rank.as("rank")), keep).select("id")

  /** Survivors as a flat InSet probe over the input — keeps every stage
    * plan shallow instead of chaining semi-joins. Built as a single
    * catalyst InSet node holding the id set: `isInCollection` expands
    * to one Literal PER ID (12800 tree nodes at the default funnel
    * operating point), and analyzing/serializing that tree costs more
    * than the stage's distance job. Ids convert to the id column's OWN
    * catalyst type (string ids -> UTF8String, long ids -> Long, ...), so
    * any orderable id type works. */
  private[graft] def filterByIds(df: DataFrame, ids: Array[Any]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.InSet
    val conv = org.apache.spark.sql.graft.Bridge.toCatalyst(df.schema("id").dataType)
    val hset: Set[Any] = ids.iterator.map(conv).toSet
    df.filter(org.apache.spark.sql.graft.Bridge.column(
      InSet(org.apache.spark.sql.graft.Bridge.expression(col("id")), hset)))
  }

  /** The guarded shared candidate-cut: decide the top-`keep` cut on a
    * slim (id, rank) projection of `cutFrame`, rematerialize survivors
    * from `probe` — collect+InSet below [[slimCutMaxIds]] (flat plans,
    * one job per cut), a distributed left-semi join above it (no driver
    * collect, no InSet literal). The fan-in partition count is probed on
    * `probe`, NOT `cutFrame`: callers pass a long-lived collection frame
    * as the probe (its `Dataset.rdd` is a lazy val, so repeat searches
    * reuse one physical-plan build) while `cutFrame` is often a per-call
    * projection of it (`withCodes`) whose `.rdd` would re-plan every
    * query; the two always partition identically because the cut frame
    * is a narrow projection of the probe. */
  private[graft] def cutAndFilter(cutFrame: DataFrame, probe: DataFrame,
      rank: Column, keep: Int, numPartitions: Int = -1): DataFrame = {
    val parts =
      if (numPartitions >= 0) numPartitions else probe.rdd.getNumPartitions
    if (keep <= slimCutMaxIds(probe))
      filterByIds(probe, slimTopIds(cutFrame, rank, keep, parts))
    else
      probe.join(slimTopIdsFrame(cutFrame, rank, keep), Seq("id"), "left_semi")
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
    val rankFor = (d: Int) => funnelStageRank(config, q, d)
    if (keeps.max > slimCutMaxIds(df))
      flatSearchPrepared(funnelSurvivorsFrame(df, rankFor, effStages, keeps),
        config, q, limit)
    else {
      val ids = funnelSurvivorIds(df, rankFor, effStages, keeps)
      flatSearchPrepared(ids.fold(df)(filterByIds(df, _)), config, q, limit)
    }
  }

  /** Matryoshka funnel over a bf16 PREFIX layout
    * ([[graft.prepare.Prepare.withBf16Prefixes]]): stage `d` scans ONLY
    * the packed `vector_bf16_p{d}` column — parquet column pruning makes
    * stage-1 IO `d1 * 2` bytes/row instead of the f32 vector's
    * `4 * dims` (8x at the default `dims/4` first stage), and the final
    * stage + rerank read the 2 B/dim full column. Cut plumbing (slim
    * cuts, identity-skip, the distributed above-[[slimCutMaxIds]]
    * fallback) is shared with [[funnelSearch]]. Results are funnel
    * semantics over the bf16-ROUNDED corpus — `candidates >= corpus`
    * degenerates to exactly [[flatSearchBf16]] (the same equivalence
    * property the f32 funnel has vs flat search). */
  def funnelSearchBf16(df: DataFrame, config: CollectionConfig,
      query: Array[Float], limit: Int, stages: Seq[Int] = Nil,
      candidates: Int = 0, widen: Int = 8,
      packedCol: String = "vector_bf16"): DataFrame = {
    val q = prepareQuery(config, query)
    val effStages = if (stages.nonEmpty) stages else defaultFunnelStages(config.dimensions)
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    require(widen >= 1, "widen must be >= 1")
    require(df.columns.contains(packedCol), s"missing bf16 column $packedCol")
    val keeps = funnelKeeps(effStages.size, effCand, widen)
    val rankFor = (d: Int) => {
      val colName =
        if (d >= config.dimensions) packedCol
        else graft.prepare.Prepare.bf16PrefixCol(d)
      require(df.columns.contains(colName),
        s"missing bf16 prefix column $colName - build the layout with Prepare.withBf16Prefixes")
      val code =
        if (config.metric == Metric.Cosine) VectorKernels.TRUE_COSINE_CODE
        else config.metric.code
      rankCol(config.metric,
        bf16VecDistanceCode(code, col(colName), q.slice(0, math.min(d, config.dimensions))))
    }
    if (keeps.max > slimCutMaxIds(df))
      flatSearchBf16Prepared(funnelSurvivorsFrame(df, rankFor, effStages, keeps),
        config, q, limit, packedCol)
    else {
      val ids = funnelSurvivorIds(df, rankFor, effStages, keeps)
      flatSearchBf16Prepared(ids.fold(df)(filterByIds(df, _)), config, q,
        limit, packedCol)
    }
  }

  /** bf16 rerank over an already-prepared query (the bf16 funnel's
    * terminal stage — [[flatSearchBf16]] minus the re-preparation). */
  private def flatSearchBf16Prepared(df: DataFrame, config: CollectionConfig,
      q: Array[Float], limit: Int, packedCol: String): DataFrame = {
    val scored = df.withColumn("raw",
        bf16VecDistance(config.metric, col(packedCol), q))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    projectResults(topK(scored, limit), config)
  }

  /** Survivor ids of the staged funnel. Ids thread through as arrays:
    * each stage filters the ORIGINAL frame by the latest id set
    * (equivalent to chaining, one probe instead of a probe per ancestor
    * stage), and a stage whose keep already covers the survivor count
    * is an identity cut — skip its job entirely (candidates >= corpus
    * makes every stage a no-op and the funnel degenerates to exact flat
    * search, the equivalence property SearchSpec pins). None = no stage
    * ran (every cut was an identity) — the candidate set is the whole
    * frame. The corpus partition count is computed ONCE per search (each
    * stage frame is a filter of the same scan, so it never changes) —
    * per-stage `df.rdd` calls would rebuild a physical plan each. */
  private def funnelSurvivorIds(df: DataFrame, rankFor: Int => Column,
      stages: Seq[Int], keeps: Seq[Int]): Option[Array[Any]] = {
    var ids: Option[Array[Any]] = None
    lazy val parts = df.rdd.getNumPartitions
    for ((d, keep) <- stages.zip(keeps) if ids.forall(_.length > keep)) {
      val cur = ids.fold(df)(filterByIds(df, _))
      ids = Some(slimTopIds(cur, rankFor(d), keep, parts))
    }
    ids
  }

  /** Distributed funnel fallback for keeps above [[slimCutMaxIds]]:
    * per-stage slim id-frame cuts chained by left-semi joins — no driver
    * collect anywhere, same survivor set as the id-threading path. */
  private def funnelSurvivorsFrame(df: DataFrame, rankFor: Int => Column,
      stages: Seq[Int], keeps: Seq[Int]): DataFrame =
    stages.zip(keeps).foldLeft(df) { case (cur, (d, keep)) =>
      cur.join(slimTopIdsFrame(cur, rankFor(d), keep), Seq("id"), "left_semi")
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
    cutAndFilter(df, df, quantizedRank(df, config, q, asymmetric), keep)

  /** Sign-bit proxy rank for the quantized candidate pass. The
    * asymmetric proxy follows the metric's rank direction: every metric
    * wants direction-similar candidates (high dot) EXCEPT
    * negative_inner_product, whose exact top-k is the most-opposite
    * direction — there high-asym candidates would exclude the true
    * winners (the symmetric Hamming mode keeps the reference's literal
    * sign-similarity semantics for every metric). */
  private def quantizedRank(df: DataFrame, config: CollectionConfig,
      q: Array[Float], asymmetric: Boolean): Column = {
    val stored =
      if (df.columns.contains("binary_vector"))
        coalesce(col("binary_vector"), packSignBits(col("vector")))
      else packSignBits(col("vector"))
    if (!asymmetric)
      packedHamming(stored, typedlit(VectorKernels.packSignBits(q)), config.dimensions)
    else if (config.metric == Metric.NegativeInnerProduct)
      packedAsymmetricDot(stored, vecLit(q))
    else -packedAsymmetricDot(stored, vecLit(q))
  }

  private def quantizedCandidateIds(df: DataFrame, config: CollectionConfig,
      q: Array[Float], keep: Int, asymmetric: Boolean = true): Array[Any] =
    // slim (id, proxy-rank) cut, like the funnel stages: the packed-bit
    // scan never sorts the full-precision rows it is there to avoid
    // reading
    slimTopIds(df, quantizedRank(df, config, q, asymmetric), keep)

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

  /** Batch ColBERT/MaxSim search: `queries` carries
    * `(qid, qvectors array<array<float>>)` — one vector SET per query —
    * and per-query results equal [[multiVectorSearch]] with the same
    * knobs. Default shape: one corpus scan scores every query set
    * ([[graft.expr.MaxSimMulti]]: the doc's vector matrix converts once
    * per row), cut by the [[graft.expr.BatchTopKAgg]] per-partition
    * heaps at rank `-score` (descending score, id ties ascending — the
    * single-query ordering); only the winners rejoin the corpus for
    * value/metadata. Any [[graft.expr.BatchTopK.supportsIdType]] id
    * column (string, long web-scale doc ids, ...) takes this one-scan
    * plan; `spark.graft.batch.heapCut=false` or an exotic id type falls
    * back to a fully distributed window-cut plan (bounded broadcast
    * query blocks, per-pair MaxSim, per-qid row_number cut — no driver
    * collect, but also no driver-side dimension/finiteness validation:
    * query sets are normalized in-plan). */
  def multiVectorSearchMany(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int,
      metricOverride: Option[Metric] = None): DataFrame = {
    require(limit > 0, "limit must be positive")
    val metric = metricOverride.getOrElse(config.metric)
    val spark = df.sparkSession
    val qidType = queries.schema("qid").dataType
    val idType = df.schema("id").dataType
    val docVecs =
      if (df.columns.contains("vectors"))
        coalesce(col("vectors"), array(col("vector")))
      else array(col("vector"))
    val metaCol =
      if (df.columns.contains("metadata")) col("metadata") else lit(null)
    val outCols = Seq(col("qid"), col("id"), col("value"),
      col("raw").cast("double").as("score"),
      lit(null).cast("double").as("distance"),
      lit(metric.name).as("metric"), metaCol.as("metadata"))
    def corpusSlim = df.select((Seq(col("id"), col("value")) ++
      (if (df.columns.contains("metadata")) Seq(col("metadata")) else Nil)): _*)
    val heapCut = heapCutEnabled(df) && graft.expr.BatchTopK.supportsIdType(idType)
    var estPairs = -1L
    val slim = if (!heapCut) {
      val qNorm = queries.select(col("qid"),
        transform(col("qvectors"),
          v => normalizeVector(config.effectiveNormalize, v)).as("qvectors"))
      val nq = queries.count()
      estPairs = nq * limit
      // block sizing uses dims (per query VECTOR, not set) — multi-vector
      // sets make each block proportionally heavier, same as the heap
      // path's avgVecs-scaled bound below
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("rank").asc_nulls_last, col("id").asc)
      queryBlocks(qNorm, nq, config.dimensions).map { qb =>
        // match the heap plan: null id / null doc-set rows never win
        df.select(col("id"), docVecs.as("_dv"))
          .filter(col("id").isNotNull && col("_dv").isNotNull)
          .crossJoin(broadcast(qb))
          .withColumn("raw", maxSim(metric, col("qvectors"), col("_dv")).cast("double"))
          .withColumn("rank", -col("raw")) // rankValue(3) = -raw, desc score
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= limit)
          .select(col("qid"), col("id"), col("raw"))
      }.reduce(_ unionByName _)
    } else {
      val rows = queries.select(col("qid"), col("qvectors")).collect()
      if (rows.isEmpty)
        return corpusSlim.limit(0)
          .withColumn("qid", lit(null).cast(qidType))
          .withColumn("raw", lit(null).cast("double"))
          .select(outCols: _*)
      estPairs = rows.length.toLong * limit
      val qsets: Array[Array[Array[Float]]] = rows.map { r =>
        r.getSeq[scala.collection.Seq[Float]](1).map { v =>
          val arr = v.toArray
          require(arr.length == config.dimensions, "dimension mismatch")
          require(VectorKernels.validateFinite(arr),
            "vector contains a non-finite value")
          prepareQuery(config, arr)
        }.toArray
      }
      val avgVecs = math.max(1, qsets.map(_.length).sum / qsets.length)
      val perBlock = heapBlockSize(spark,
        avgVecs * math.max(config.dimensions, 1), limit)
      rows.zip(qsets).grouped(perBlock).toSeq.map { block =>
        val bc = BroadcastHandles.register(spark,
          spark.sparkContext.broadcast(block.map(_._2)))
        heapTops(df.select(col("id"),
            org.apache.spark.sql.graft.Bridge.column(graft.expr.MaxSimMulti(
              org.apache.spark.sql.graft.Bridge.expression(docVecs),
              bc, metric.code)).as("_ds")),
            block.length, limit, 3, idType) // rankValue(3) = -raw
          .join(broadcast(qiFrame(spark, block.map(_._1), qidType)), "_qi")
          .select("qid", "id", "raw")
      }.reduce(_ unionByName _)
    }
    val hint = rowsBroadcastHint(df, estPairs)
    corpusSlim.join(hint(slim), Seq("id")).select(outCols: _*)
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
    val funKeeps = funnelKeeps(effStages.size, effCand, widen)
    val flatRank =
      rankCol(config.metric, vecDistance(config.metric, col("vector"), vecLit(q)))
    val maxKeep =
      if (generators.contains("funnel")) math.max(funKeeps.max, effCand) else effCand
    val union = if (maxKeep > slimCutMaxIds(df)) {
      // distributed fallback (keeps above the driver-collect bound):
      // each generator yields a slim id FRAME, the union dedups by id,
      // survivors rematerialize via one left-semi join
      val idFrames = generators.map {
        case "funnel" =>
          funnelSurvivorsFrame(df, d => funnelStageRank(config, q, d),
            effStages, funKeeps).select("id")
        case "quantized" =>
          slimTopIdsFrame(df, quantizedRank(df, config, q, asymmetric), effCand)
        case "search" | "flat" => slimTopIdsFrame(df, flatRank, effCand)
        case g => throw new IllegalArgumentException(s"unknown generator $g")
      }
      df.join(idFrames.reduce(_ unionByName _).distinct(), Seq("id"), "left_semi")
    } else {
      // every generator reduces to a candidate ID SET (slim cuts — see
      // funnelStageRank); the union-with-first-seen-dedup of identical
      // corpus rows IS set union, so the old frame-union + dropDuplicates
      // shuffle collapses into one InSet probe feeding a single rerank
      // scan. None = a generator whose every cut was an identity (keep >=
      // corpus): its candidate set is the whole frame, so the union is too
      val idSets: Seq[Option[Array[Any]]] = generators.map {
        case "funnel" =>
          funnelSurvivorIds(df, d => funnelStageRank(config, q, d), effStages, funKeeps)
        case "quantized" =>
          Some(quantizedCandidateIds(df, config, q, effCand, asymmetric))
        case "search" | "flat" => Some(slimTopIds(df, flatRank, effCand))
        case g => throw new IllegalArgumentException(s"unknown generator $g")
      }
      if (idSets.exists(_.isEmpty)) df
      else filterByIds(df, idSets.flatMap(_.get).distinct.toArray)
    }
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
    * at once. `queries` must have (qid, qvector); results carry qid. This
    * is the shape that scales on a cluster — per-query driver jobs do
    * not. */
  def flatSearchMany(df: DataFrame, config: CollectionConfig, queries: DataFrame,
      limit: Int, knownNq: Long = -1L): DataFrame =
    batchTopMulti(df, config, queries, limit, bc =>
      org.apache.spark.sql.graft.Bridge.column(
        graft.expr.VectorDistanceMulti(
          org.apache.spark.sql.graft.Bridge.expression(col("vector")),
          bc, config.metric.code)),
      scanCol = "vector",
      pairRaw = vecDistance(config.metric, col("vector"), col("qvector")),
      knownNq = knownNq)

  /** Shared brute-force batch plan of [[flatSearchMany]] /
    * [[flatSearchManyBf16]], two physical shapes behind one contract:
    *
    *  - HEAP CUT (default, any [[graft.expr.BatchTopK.supportsIdType]]
    *    id column): the query batch collects to the driver (bounded by
    *    the caller's batch size; blocks re-bound both the broadcast
    *    matrix and per-partition heap mass via [[heapBlockSize]]) and
    *    each block ships ONCE per executor as a `SparkContext.broadcast`
    *    float matrix inside a multi-distance expression: the scan emits
    *    each corpus row's distances to the WHOLE block as one primitive
    *    array, cut by [[graft.expr.BatchTopKAgg]]'s per-partition
    *    bounded heaps — nothing exploded, nothing sorted beyond the
    *    nq*k winners. Per-call broadcasts register with
    *    [[BroadcastHandles]] so a long-lived serving session stays
    *    bounded.
    *  - WINDOW CUT (`spark.graft.batch.heapCut=false`, or an exotic id
    *    type): fully distributed, NO driver collect — the normalized
    *    query frame splits into [[queryBlocks]]-bounded broadcast
    *    blocks, each cross-joins the slim (id, scan column) projection,
    *    and per-qid top-k rides row_number's map-side WindowGroupLimit.
    *    The cluster-scale shape for query batches too large to collect.
    *
    * Either way only slim (qid, id, raw) triples leave the scan; the
    * final `nq * limit` winners rejoin the corpus for `value` — the
    * per-pair payload copying of the old cross-join plan (vector +
    * qvector + value, ~KB, x nq before the cut) never happens. A row
    * with a NULL vector or id yields no winners under both plans (it can
    * never reach a top-k that exact search would return on a validated
    * collection; single-query topK instead keeps null ranks LAST, so on
    * an UNVALIDATED frame with fewer than `limit` scorable rows the
    * batch forms return fewer rows — see README). */
  private def batchTopMulti(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int,
      multiCol: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]] => Column,
      scanCol: String, pairRaw: Column, knownNq: Long): DataFrame = {
    val spark = df.sparkSession
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    val outCols = Seq(col("qid"), col("id"), col("value"),
      score.cast("double").as("score"), dist.cast("double").as("distance"),
      lit(config.metric.name).as("metric"))
    val qidType = qNorm.schema("qid").dataType
    val idType = df.schema("id").dataType
    val heapCut = heapCutEnabled(df) && graft.expr.BatchTopK.supportsIdType(idType)
    var estPairs = -1L
    val slim = if (!heapCut) {
      val nq = if (knownNq >= 0) knownNq else queries.count()
      estPairs = nq * math.max(limit, 1)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("rank").asc_nulls_last, col("id").asc)
      queryBlocks(qNorm, nq, config.dimensions).map { qb =>
        // null id/scan rows drop here exactly as the heap plan drops
        // them (BatchTopKAgg skips null ids/distances) — without this a
        // null row fills row_number slots when scorable rows < limit
        df.select(col("id"), col(scanCol))
          .filter(col("id").isNotNull && col(scanCol).isNotNull)
          .crossJoin(broadcast(qb))
          .withColumn("raw", pairRaw)
          .withColumn("rank", rankCol(config.metric, col("raw")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= limit)
          .select(col("qid"), col("id"), col("raw"))
      }.reduce(_ unionByName _)
    } else {
      val rows = qNorm.collect()
      if (rows.isEmpty)
        return df.limit(0).select(col("id"), col("value"))
          .withColumn("qid", lit(null).cast(qidType))
          .withColumn("raw", lit(null).cast("double"))
          .select(outCols: _*)
      estPairs = rows.length.toLong * math.max(limit, 1)
      val perBlock = heapBlockSize(spark, config.dimensions, math.max(limit, 1))
      rows.grouped(perBlock).toSeq.map { blockRows =>
        val bc = BroadcastHandles.register(spark, spark.sparkContext
          .broadcast(blockRows.map(_.getSeq[Float](1).toArray)))
        heapTops(df.select(col("id"), multiCol(bc).as("_ds")),
            blockRows.length, math.max(limit, 0), config.metric.code, idType)
          .join(broadcast(qiFrame(spark, blockRows, qidType)), "_qi")
          .select("qid", "id", "raw")
      }.reduce(_ unionByName _)
    }
    val hint = rowsBroadcastHint(df, estPairs)
    df.select(col("id"), col("value"))
      .join(hint(slim), Seq("id"))
      .select(outCols: _*)
  }

  /** Batch form of [[flatSearchBf16]]: one bf16-scan answers every
    * query — the batch brute-force at HALF the f32 scan bytes, with the
    * same rounded-corpus top-k contract as the single-query form
    * (physical shapes per [[batchTopMulti]]). */
  def flatSearchManyBf16(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int,
      packedCol: String = "vector_bf16", knownNq: Long = -1L): DataFrame = {
    require(limit > 0, "limit must be positive")
    require(df.columns.contains(packedCol), s"missing bf16 column $packedCol")
    batchTopMulti(df, config, queries, limit, bc =>
      org.apache.spark.sql.graft.Bridge.column(
        graft.expr.Bf16VectorDistanceMulti(
          org.apache.spark.sql.graft.Bridge.expression(col(packedCol)),
          bc, config.metric.code)),
      scanCol = packedCol,
      pairRaw = col2Bf16Distance(config.metric, col(packedCol), col("qvector")),
      knownNq = knownNq)
  }

  private[graft] def col2Bf16Distance(metric: Metric, packed: Column, q: Column): Column =
    col2Bf16DistanceCode(metric.code, packed, q)

  private def col2Bf16DistanceCode(code: Int, packed: Column, q: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expr.Bf16VectorDistance(
        org.apache.spark.sql.graft.Bridge.expression(packed),
        org.apache.spark.sql.graft.Bridge.expression(q), code))

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
    val nq = if (knownNq >= 0) knownNq else queries.count()
    val cands = quantizedCandPairs(df, config, qNorm, effCand, asymmetric, nq)
    rerankManyExact(df, config, cands, qNorm, limit,
      perQueryBound = effCand, knownNq = nq)
  }

  /** (qid, id) candidate pairs of the batch quantized pass.
    * Bits-ONLY candidate scan: when the stored `binary_vector` exists
    * (canonical collections always derive it at ingest) the scan must
    * not also decode `vector` — a coalesce fallback would drag the
    * full f32 column through the widest stage and erase the 32x
    * narrow-scan advantage. A row with a NULL stored binary_vector
    * (non-canonical input) ranks null and sorts LAST, i.e. it is
    * excluded from candidates rather than silently promoted. */
  private def quantizedCandPairs(df: DataFrame, config: CollectionConfig,
      qNorm: DataFrame, effCand: Int, asymmetric: Boolean,
      nq: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val bitsScan =
      if (df.columns.contains("binary_vector"))
        df.select(col("id"), col("binary_vector").as("_bits"))
      else df.select(col("id"), packSignBits(col("vector")).as("_bits"))
    val idType = df.schema("id").dataType
    if (heapCutEnabled(df) && graft.expr.BatchTopK.supportsIdType(idType)) {
      // multi-rank scan + heap cut: the stored words convert once per
      // row for the whole query block; rank code 0 = the emitted value
      // IS the rank (direction pre-baked), ties by id as the window cut
      val rows = qNorm.collect()
      if (rows.isEmpty)
        return df.limit(0).select(col("id"))
          .crossJoin(qNorm.limit(0).select(col("qid"))).select("qid", "id")
      val perBlock = heapBlockSize(spark, config.dimensions, effCand)
      val qidType = qNorm.schema("qid").dataType
      rows.grouped(perBlock).toSeq.map { blockRows =>
        val mat = blockRows.map(_.getSeq[Float](1).toArray)
        val multi =
          if (asymmetric)
            org.apache.spark.sql.graft.Bridge.column(
              graft.expr.PackedDotMulti(
                org.apache.spark.sql.graft.Bridge.expression(col("_bits")),
                BroadcastHandles.register(spark, spark.sparkContext.broadcast(mat)),
                negate = config.metric != Metric.NegativeInnerProduct))
          else
            org.apache.spark.sql.graft.Bridge.column(
              graft.expr.PackedHammingMulti(
                org.apache.spark.sql.graft.Bridge.expression(col("_bits")),
                BroadcastHandles.register(spark, spark.sparkContext
                  .broadcast(mat.map(VectorKernels.packSignBits))),
                config.dimensions))
        heapTops(bitsScan.select(col("id"), multi.as("_ds")),
            mat.length, effCand, 0, idType)
          .join(broadcast(qiFrame(spark, blockRows, qidType)), "_qi")
          .select("qid", "id")
      }.reduce(_ unionByName _)
    } else {
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
      queryBlocks(qSide, nq, config.dimensions).map { qb =>
        bitsScan
          .filter(col("id").isNotNull && col("_bits").isNotNull)
          .crossJoin(broadcast(qb))
          .withColumn("_qrank", rank)
          .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= effCand)
          .select("qid", "id")
      }.reduce(_ unionByName _)
    }
  }

  /** Query-block size for the heap-cut batch plans: bounds both the
    * broadcast matrix (`spark.graft.query.broadcastMaxCells` floats) and
    * the per-partition heap mass (`spark.graft.rerank.broadcastMaxRows`
    * entries at `k` kept per query). */
  private def heapBlockSize(spark: org.apache.spark.sql.SparkSession,
      dims: Int, k: Int): Int = {
    val maxCells = spark.conf.getOption("spark.graft.query.broadcastMaxCells")
      .map(_.toLong).getOrElse(32000000L)
    val maxEntries = spark.conf.getOption("spark.graft.rerank.broadcastMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    math.max(1L, math.min(maxCells / math.max(dims, 1),
      maxEntries / math.max(k, 1))).min(Int.MaxValue).toInt
  }

  /** Column twin of [[VectorKernels.rankValue]] — plain double
    * arithmetic, so the value is bit-identical to what the heap
    * comparator ranked by. */
  private def rankValueCode(code: Int, raw: Column): Column = code match {
    case 2 => lit(1.0) - raw
    case 3 => -raw
    case _ => raw
  }

  /** Shared heap-cut tail of the batch plans: scored (id, _ds[nq]) rows
    * -> slim (_qi, id, raw) winners. Single global aggregate while the
    * buffer mass `nq * k` stays within
    * `spark.graft.batch.mergeSingleMaxEntries` (default 262144 entries);
    * above it the FINAL MERGE — one reduce task offering every
    * partition's nq * min(k, partitionRows) partial entries — becomes
    * the plan's only serial stage (measured: 64 queries x keep 12800
    * over 5M rows spend ~18 s of a 24 s batch funnel in that task, and
    * at 1000 executors the single reducer is a hard scale ceiling), so
    * the cut goes TWO-LEVEL: per-corpus-slice heaps in
    * `spark.graft.batch.mergeGroups` (default 8) parallel groups keyed
    * on `spark_partition_id() % G` — each map task belongs to exactly
    * ONE group, so per-task buffer memory and partial-row output stay
    * identical to the single-level plan (a value-hashed key would give
    * every task all G buffers: G x nq x k slots per task OOMs) — then a
    * parallel per-qi window cut over the G*nq*k slim survivors. Rows
    * are bit-identical either way — the global top-k is the top-k of
    * the union of ANY disjoint corpus slicing's top-k's, and the window
    * cut orders by the SAME (rank, id) the heap comparator replicates
    * ([[rankValueCode]] + native id order). */
  private def heapTops(scored: DataFrame, nq: Int, k: Int, code: Int,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = scored.sparkSession
    val agg = org.apache.spark.sql.graft.Bridge.column(
      graft.expr.BatchTopKAgg(
        org.apache.spark.sql.graft.Bridge.expression(col("id")),
        org.apache.spark.sql.graft.Bridge.expression(col("_ds")),
        nq, k, code, idType).toAggregateExpression())
    val maxSingle = spark.conf.getOption("spark.graft.batch.mergeSingleMaxEntries")
      .map(_.toLong).getOrElse(262144L)
    val single = nq.toLong * math.max(k, 1) <= maxSingle
    val grouped =
      if (single) scored.groupBy()
      else {
        val g = spark.conf.getOption("spark.graft.batch.mergeGroups")
          .map(_.toInt).getOrElse(8)
        scored.groupBy(
          pmod(spark_partition_id(), lit(math.max(g, 1))).as("_mg"))
      }
    val tops = grouped.agg(agg.as("_tops"))
      .select(explode(col("_tops")).as("_t"))
      .select(col("_t.qi").as("_qi"), col("_t.id").as("id"),
        col("_t.raw").as("raw"))
    if (single) tops
    else {
      val w = Window.partitionBy(col("_qi"))
        .orderBy(col("_rk").asc_nulls_last, col("id").asc)
      tops.withColumn("_rk", rankValueCode(code, col("raw")))
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
        .select(col("_qi"), col("id"), col("raw"))
    }
  }

  /** The (qi -> qid) side frame of a collected query block. */
  private def qiFrame(spark: org.apache.spark.sql.SparkSession,
      blockRows: Array[org.apache.spark.sql.Row],
      qidType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(blockRows.zipWithIndex.map { case (r, i) =>
        Row(i, r.get(0)) }: _*),
      StructType(Seq(StructField("_qi", IntegerType, nullable = false),
        StructField("qid", qidType))))
  }

  /** Query-side broadcast guard for the batch searches. One broadcast
    * block while `nq * dims` stays within
    * `spark.graft.query.broadcastMaxCells` (default 32M f32 cells ≈
    * 128 MB of query vectors); above it the query frame splits into
    * `ceil(cells / max)` disjoint `hash(qid)` blocks, each bounded and
    * broadcast independently — a 1M-query × 384-dim batch becomes ~12
    * ~128 MB broadcasts instead of one unconditional ~1.5 GB one that
    * would sink every executor (and the driver) at once. Blocks
    * partition QUERIES, never corpus rows, so per-qid window cuts stay
    * complete within a block and callers just union the per-block
    * results (each block = one extra corpus scan — the unavoidable
    * brute-force cost, paid with bounded memory). `nq < 0` (unknown) =
    * one block: callers resolve nq first (a count of the query frame is
    * a tiny job; the corpus is untouched). */
  private def queryBlocks(qNorm: DataFrame, nq: Long, dims: Int): Seq[DataFrame] = {
    val maxCells = qNorm.sparkSession.conf
      .getOption("spark.graft.query.broadcastMaxCells").map(_.toLong)
      .getOrElse(32000000L)
    val cells = if (nq < 0) -1L else nq * math.max(dims, 1).toLong
    if (cells < 0 || cells <= maxCells) Seq(qNorm)
    else {
      val nBlocks = math.min((cells + maxCells - 1) / maxCells, 4096L).toInt
      (0 until nBlocks).map(i =>
        qNorm.filter(pmod(hash(col("qid")), lit(nBlocks)) === lit(i)))
    }
  }

  /** `spark.graft.batch.heapCut` (default true): the BatchTopKAgg heap
    * plan for batch cuts. The window/exploded plan stays reachable for
    * plan-level A/B and as the non-string-id fallback — results are
    * identical either way. */
  private def heapCutEnabled(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.batch.heapCut")
      .forall(_.toBoolean)

  /** Broadcast-or-shuffle hint keyed on an estimated ROW count against
    * `spark.graft.rerank.broadcastMaxRows` (default 4M) — the shared
    * bound for bounded candidate-pair frames riding back onto a corpus
    * scan. Negative estimate = unknown = broadcast (callers only pass
    * negative when the frame is structurally tiny). */
  private def rowsBroadcastHint(df: DataFrame, estRows: Long): DataFrame => DataFrame = {
    val maxRows = df.sparkSession.conf
      .getOption("spark.graft.rerank.broadcastMaxRows").map(_.toLong)
      .getOrElse(4000000L)
    if (estRows < 0 || estRows <= maxRows) broadcast(_) else identity
  }

  /** Batch funnel rank at prefix `d` with the query as a COLUMN (the
    * broadcast batch shape) — the same math as the single-query
    * [[funnelStageRank]]: true cosine on prefixes for cosine, the
    * metric's own kernel otherwise. */
  private def funnelStageRankCols(config: CollectionConfig, d: Int): Column = {
    val vP = if (d >= config.dimensions) col("vector") else slice(col("vector"), 1, d)
    val qP = if (d >= config.dimensions) col("qvector") else slice(col("qvector"), 1, d)
    val raw =
      if (config.metric == Metric.Cosine) trueCosine(vP, qP)
      else vecDistance(config.metric, vP, qP)
    rankCol(config.metric, raw)
  }

  /** (qid, id) survivors of the staged batch funnel: stage 1 scores the
    * full corpus against every query in ONE broadcast cross-join scan at
    * the smallest prefix; each later stage joins the corpus back onto
    * the previous stage's bounded survivor pairs (broadcast while
    * `nq * keep` fits the rerank bound) and re-cuts per qid via
    * row_number's map-side WindowGroupLimit. No driver collect at any
    * stage — the batch shape a million-query training run needs (the
    * single-query path's per-stage driver round-trips are exactly what
    * it cannot pay). */
  private def funnelCandPairs(df: DataFrame, config: CollectionConfig,
      qNorm: DataFrame, stages: Seq[Int], keeps: Seq[Int], nq: Long): DataFrame =
    funnelCandPairsWith(df, config, qNorm, stages, keeps, nq,
      _ => "vector", d => funnelStageRankCols(config, d),
      Some { (m, d) =>
        val code =
          if (config.metric == Metric.Cosine) VectorKernels.TRUE_COSINE_CODE
          else config.metric.code
        org.apache.spark.sql.graft.Bridge.column(
          graft.expr.VectorDistanceMulti(
            org.apache.spark.sql.graft.Bridge.expression(col("vector")),
            BroadcastHandles.register(df.sparkSession,
              df.sparkSession.sparkContext.broadcast(m)), code,
            prefix = if (d >= config.dimensions) 0 else d))
      })

  /** Shared staged-cut plumbing of the batch funnels, parameterized on
    * the per-stage scan column and rank (f32 slices `vector`; bf16 scans
    * the packed `d`-prefix column so parquet column pruning keeps stage
    * IO at `2 * d` bytes/row). When `stage1Multi` is given and the id
    * column is a string, STAGE 1 — the only stage that scans the whole
    * corpus — runs as a multi-distance scan + [[graft.expr.BatchTopKAgg]]
    * heap cut (each row scores the whole pre-sliced query block in one
    * kernel call, per-partition bounded heaps combine map-side) instead
    * of a per-pair cross join; later stages see only bounded survivor
    * pairs and keep the broadcast-join window cuts. Query blocks bound
    * BOTH the broadcast matrix (`spark.graft.query.broadcastMaxCells`)
    * and the per-partition heap mass
    * (`spark.graft.rerank.broadcastMaxRows` entries). */
  private def funnelCandPairsWith(df: DataFrame, config: CollectionConfig,
      qNorm: DataFrame, stages: Seq[Int], keeps: Seq[Int], nq: Long,
      stageCol: Int => String, stageRank: Int => Column,
      stage1Multi: Option[(Array[Array[Float]], Int) => Column] = None): DataFrame = {
    val spark = df.sparkSession
    val idType = df.schema("id").dataType
    val heapOk = stage1Multi.isDefined && heapCutEnabled(df) &&
      graft.expr.BatchTopK.supportsIdType(idType)
    if (!heapOk) {
      val blocks = queryBlocks(qNorm, nq, config.dimensions)
      // hash(qid) splits queries near-uniformly, so each block carries
      // ~nq/blocks queries — the per-stage pair bound scales with it
      val blockNq = if (nq >= 0 && blocks.size > 1) nq / blocks.size + 1 else nq
      return blocks.map(funnelCandPairsBlock(df, _, null, 0L, stages, keeps,
        blockNq, stageCol, stageRank)).reduce(_ unionByName _)
    }
    val rows = qNorm.collect()
    if (rows.isEmpty)
      return df.limit(0).select(col("id"))
        .crossJoin(qNorm.limit(0).select(col("qid"))).select("qid", "id")
    val perBlock = heapBlockSize(spark, config.dimensions, keeps.head)
    val qidType = qNorm.schema("qid").dataType
    rows.grouped(perBlock).toSeq.map { blockRows =>
      val mat = blockRows.map(_.getSeq[Float](1).toArray)
      val d1 = stages.head
      val sliced =
        if (d1 >= config.dimensions) mat
        else mat.map(q => java.util.Arrays.copyOf(q, d1))
      val stage1 = heapTops(
          df.select(col("id"), stage1Multi.get(sliced, d1).as("_ds")),
          mat.length, keeps.head, config.metric.code, idType)
        .join(broadcast(qiFrame(spark, blockRows, qidType)), "_qi")
        .select("qid", "id")
        if (stages.size == 1) stage1
      else {
        val blockFrame = spark.createDataFrame(
          java.util.Arrays.asList(blockRows: _*), qNorm.schema)
        funnelCandPairsBlock(df, blockFrame, stage1, keeps.head.toLong,
          stages.tail, keeps.tail, blockRows.length.toLong, stageCol, stageRank)
      }
    }.reduce(_ unionByName _)
  }

  private def funnelCandPairsBlock(df: DataFrame, qBlock: DataFrame,
      init: DataFrame, initKeep: Long,
      stages: Seq[Int], keeps: Seq[Int], nq: Long,
      stageCol: Int => String, stageRank: Int => Column): DataFrame = {
    var pairs: DataFrame = init
    var prevKeep = initKeep
    for ((d, keep) <- stages.zip(keeps)) {
      val scored =
        if (pairs == null)
          // stage-1 drops null id/prefix rows like the heap stage-1
          // (BatchTopKAgg skips null ids/distances) — see batchTopMulti
          df.select(col("id"), col(stageCol(d)))
            .filter(col("id").isNotNull && col(stageCol(d)).isNotNull)
            .crossJoin(broadcast(qBlock))
        else {
          val hint = rowsBroadcastHint(df, if (nq >= 0) nq * prevKeep else -1L)
          df.select(col("id"), col(stageCol(d)))
            .join(hint(pairs), Seq("id"))
            .join(broadcast(qBlock), Seq("qid"))
        }
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("_fr").asc_nulls_last, col("id").asc)
      pairs = scored.withColumn("_fr", stageRank(d))
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= keep)
        .select("qid", "id")
      prevKeep = keep
    }
    pairs
  }

  /** Batch Matryoshka funnel search: per-query results equal
    * [[funnelSearch]] with the same stages/candidates/widen. Stage cuts
    * are per-qid window cuts over broadcast-joined survivor pairs (see
    * [[funnelCandPairs]]); the exact rerank is the shared bounded
    * broadcast tail. */
  def funnelSearchMany(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int, stages: Seq[Int] = Nil,
      candidates: Int = 0, widen: Int = 8, knownNq: Long = -1L): DataFrame = {
    require(limit > 0, "limit must be positive")
    val effStages = if (stages.nonEmpty) stages else defaultFunnelStages(config.dimensions)
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    require(widen >= 1, "widen must be >= 1")
    val keeps = funnelKeeps(effStages.size, effCand, widen)
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val nq = if (knownNq >= 0) knownNq else queries.count()
    val pairs = funnelCandPairs(df, config, qNorm, effStages, keeps, nq)
    rerankManyExact(df, config, pairs, qNorm, limit, effCand, nq)
  }

  /** Batch funnel rank at prefix `d` over the packed bf16 layout with
    * the query as a COLUMN — the same math as the single-query
    * [[funnelSearchBf16]] stage rank (true cosine on prefixes for
    * cosine, the metric's own kernel otherwise). */
  private def bf16StageRankCols(config: CollectionConfig, d: Int,
      packedCol: String): Column = {
    val packed =
      if (d >= config.dimensions) col(packedCol)
      else col(graft.prepare.Prepare.bf16PrefixCol(d))
    val qP = if (d >= config.dimensions) col("qvector") else slice(col("qvector"), 1, d)
    val code =
      if (config.metric == Metric.Cosine) VectorKernels.TRUE_COSINE_CODE
      else config.metric.code
    rankCol(config.metric, col2Bf16DistanceCode(code, packed, qP))
  }

  /** Batch Matryoshka funnel over a bf16 PREFIX layout: per-query
    * results equal [[funnelSearchBf16]] with the same knobs. Stage `d`
    * scans ONLY the packed `2 * d`-byte prefix column (the batch twin of
    * the single-query form's column-pruned stages); cuts are per-qid
    * window cuts over bounded broadcast-joined survivor pairs, the exact
    * rerank reads the full bf16 column — no f32 column needed anywhere,
    * so the at-rest bf16 layout serves a million-query batch without
    * per-query driver round-trips. */
  def funnelSearchManyBf16(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int, stages: Seq[Int] = Nil,
      candidates: Int = 0, widen: Int = 8,
      packedCol: String = "vector_bf16", knownNq: Long = -1L): DataFrame = {
    require(limit > 0, "limit must be positive")
    require(df.columns.contains(packedCol), s"missing bf16 column $packedCol")
    val effStages = if (stages.nonEmpty) stages else defaultFunnelStages(config.dimensions)
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    require(widen >= 1, "widen must be >= 1")
    val keeps = funnelKeeps(effStages.size, effCand, widen)
    val stageColF = (d: Int) =>
      if (d >= config.dimensions) packedCol
      else graft.prepare.Prepare.bf16PrefixCol(d)
    effStages.foreach(d => require(df.columns.contains(stageColF(d)),
      s"missing bf16 prefix column ${stageColF(d)} - build the layout with Prepare.withBf16Prefixes"))
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val nq = if (knownNq >= 0) knownNq else queries.count()
    val pairs = funnelCandPairsWith(df, config, qNorm, effStages, keeps, nq,
      stageColF, d => bf16StageRankCols(config, d, packedCol),
      Some { (m, d) =>
        // the prefix COLUMN is already the d-dim payload; the query
        // block arrives pre-sliced to match
        val code =
          if (config.metric == Metric.Cosine) VectorKernels.TRUE_COSINE_CODE
          else config.metric.code
        org.apache.spark.sql.graft.Bridge.column(
          graft.expr.Bf16VectorDistanceMulti(
            org.apache.spark.sql.graft.Bridge.expression(col(stageColF(d))),
            BroadcastHandles.register(df.sparkSession,
              df.sparkSession.sparkContext.broadcast(m)), code))
      })
    rerankManyExactBf16(df, config, pairs, qNorm, limit, effCand, nq, packedCol)
  }

  /** Exact batch rerank over (qid, id) pairs at bf16 width — the
    * [[rerankManyExact]] shape reading the packed bf16 column instead of
    * the f32 `vector` (which a bf16-only layout does not carry). */
  private[graft] def rerankManyExactBf16(df: DataFrame, config: CollectionConfig,
      candidates: DataFrame, queries: DataFrame, limit: Int,
      perQueryBound: Int, knownNq: Long, packedCol: String): DataFrame = {
    val nq = if (knownNq >= 0) knownNq
             else if (perQueryBound > 0) queries.count() else -1L
    val bound = if (perQueryBound > 0 && nq >= 0) nq * perQueryBound else -1L
    val hint = rowsBroadcastHint(df, bound)
    val joined = df.select(col("id"), col("value"), col(packedCol))
      .join(hint(candidates.select("qid", "id")), Seq("id"))
      .join(hint(queries.select("qid", "qvector")), Seq("qid"))
      .withColumn("raw", col2Bf16Distance(config.metric, col(packedCol), col("qvector")))
      .withColumn("rank", rankCol(config.metric, col("raw")))
    val w = Window.partitionBy(col("qid")).orderBy(col("rank").asc_nulls_last, col("id").asc)
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= limit)
      .select(col("qid"), col("id"), col("value"),
        score.cast("double").as("score"), dist.cast("double").as("distance"),
        lit(config.metric.name).as("metric"))
  }

  /** Batch hybrid search: every generator emits bounded (qid, id)
    * candidate pairs in batch form (funnel = [[funnelCandPairs]],
    * quantized = the bits-only broadcast scan, flat = one full-precision
    * broadcast scan), the union dedups per (qid, id), and ONE exact
    * rerank scores the survivors — per-query results equal
    * [[hybridSearch]] with the same knobs. */
  def hybridSearchMany(df: DataFrame, config: CollectionConfig,
      queries: DataFrame, limit: Int,
      generators: Seq[String] = Seq("funnel", "quantized"),
      candidates: Int = 0, stages: Seq[Int] = Nil, widen: Int = 8,
      asymmetric: Boolean = true, knownNq: Long = -1L): DataFrame = {
    require(limit > 0, "limit must be positive")
    require(generators.nonEmpty, "at least one generator")
    val effCand = if (candidates > 0) candidates else math.max(20 * limit, limit)
    require(effCand >= limit, "candidates must be >= limit")
    val effStages = if (stages.nonEmpty) stages else defaultFunnelStages(config.dimensions)
    val qNorm = queries.select(col("qid"),
      normalizeVector(config.effectiveNormalize, col("qvector")).as("qvector"))
    val nq = if (knownNq >= 0) knownNq else queries.count()
    val pairs = generators.map {
      case "funnel" =>
        funnelCandPairs(df, config, qNorm, effStages,
          funnelKeeps(effStages.size, effCand, widen), nq)
      case "quantized" =>
        quantizedCandPairs(df, config, qNorm, effCand, asymmetric, nq)
      case "search" | "flat" =>
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("_fr").asc_nulls_last, col("id").asc)
        queryBlocks(qNorm, nq, config.dimensions).map { qb =>
          df.select(col("id"), col("vector"))
            .filter(col("id").isNotNull && col("vector").isNotNull)
            .crossJoin(broadcast(qb))
            .withColumn("_fr",
              rankCol(config.metric, vecDistance(config.metric, col("vector"), col("qvector"))))
            .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= effCand)
            .select("qid", "id")
        }.reduce(_ unionByName _)
      case g => throw new IllegalArgumentException(s"unknown generator $g")
    }.reduce(_ unionByName _).distinct()
    rerankManyExact(df, config, pairs, qNorm, limit,
      perQueryBound = effCand * generators.size, knownNq = nq)
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
    // a caller that knows its batch size passes it; otherwise the
    // query-side count is a tiny job (nq rows) — the corpus is untouched
    val nq = if (knownNq >= 0) knownNq
             else if (perQueryBound > 0) queries.count() else -1L
    val bound = if (perQueryBound > 0 && nq >= 0) nq * perQueryBound else -1L
    val hint = rowsBroadcastHint(df, bound)
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
