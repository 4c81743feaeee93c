package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.functions.VectorFunctions._
import graft.search.Search

/** Driver contract — one entry per implemented operator (SURVEY §2), with
  * DuckDB oracle SQL mirroring the engine's arithmetic (f32 normalize,
  * f64 accumulate) so scores agree to well past the 6-decimal rounding. */
object SparkEntry {

  /** Flagship: exact flat cosine top-10 over the embeddings collection. */
  def entry(spark: SparkSession): DataFrame =
    queries("vec_flat_cosine_topk")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------- helpers

  private def roundCols(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), scale) + lit(0.0)))

  /** Flat search with rounded score/distance for oracle comparison. */
  private def flatTopK(spark: SparkSession, dir: String, metric: Metric,
      k: Int): DataFrame = {
    val d = Tables.dims(spark, dir)
    val config = CollectionConfig("embeddings", d, metric)
    val coll = Tables.embeddingsCollection(spark, dir, config)
    val q = Tables.queryVector(spark, dir, 0L)
    roundCols(Search.flatSearch(coll, config, q, k).drop("metadata"),
      Seq("score", "distance"))
  }

  // --------------------------------------------------- oracle SQL helpers

  /** f32 L2-normalize of a DuckDB FLOAT[] column (matches engine ingest:
    * f64 norm, per-element f32 cast). */
  private def sqlNorm(v: String): String =
    s"list_transform($v, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_sum(list_transform($v, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS FLOAT))"

  /** f64 dot product of two DuckDB FLOAT[] columns. */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def sqlL2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  /** f64 asymmetric binary dot: full-precision query q against sign(v) —
    * mirrors VectorKernels.packedAsymmetricDot (ascending-index f64 sum). */
  private def sqlAsymDot(v: String, q: String): String =
    s"list_sum(list_transform(range(1, len($v)+1), i -> CASE WHEN $v[i] >= 0 THEN CAST($q[i] AS DOUBLE) ELSE -CAST($q[i] AS DOUBLE) END))"

  /** Packed sign-bit word w (0-based) of a FLOAT[] as signed BIGINT. */
  private def sqlSignWord(v: String, word: Int, dims: Int): String = {
    val lo = word * 64
    val hi = math.min(lo + 64, dims)
    s"CAST(CASE WHEN _sw$word >= (1::HUGEINT << 63) THEN _sw$word - (1::HUGEINT << 64) ELSE _sw$word END AS BIGINT)"
  }

  private def sqlSignWordRaw(v: String, word: Int, dims: Int): String = {
    val lo = word * 64
    val hi = math.min(lo + 64, dims)
    s"list_sum(list_transform(range($lo, $hi), b -> CASE WHEN $v[b+1] >= 0 THEN 1::HUGEINT << (b - $lo) ELSE 0::HUGEINT END))"
  }

  // ------------------------------------------------------------- queries

  /** l2-metric collection + query, shared by funnel/quantized/hybrid. */
  private def l2Setup(s: SparkSession, dir: String) = {
    val d = Tables.dims(s, dir)
    val config = Tables.l2Config(d)
    (config, Tables.embeddingsCollection(s, dir, config), Tables.queryVector(s, dir, 0L))
  }

  /** Label-grouped multi-vector "documents" built from the embeddings
    * table (vectors ordered by vec_id for determinism). */
  private def labelDocs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("vec_id"), col("embedding")))).as("sv"))
      .select(col("label").cast("string").as("id"),
        col("label").cast("string").as("value"),
        transform(col("sv"), x => x.getField("embedding")).as("vectors"))
      .withColumn("vector", element_at(col("vectors"), 1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = TrainingQueries.queries ++ Map(
    "vec_flat_cosine_topk" -> ((s, dir) => flatTopK(s, dir, Metric.Cosine, 10)),
    "vec_flat_l2_topk" -> ((s, dir) => flatTopK(s, dir, Metric.L2, 10)),
    "vec_flat_ip_topk" -> ((s, dir) => flatTopK(s, dir, Metric.InnerProduct, 10)),

    // cursor pagination (search_after): page 2 of the exact cosine
    // ranking via the (distance, id) cursor of page 1's last row — must
    // tile the ranking exactly like OFFSET under the strict (rank, id)
    // total order
    "vec_search_after_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val q = Tables.queryVector(s, dir, 0L)
      val last = Search.flatSearch(coll, config, q, 10).collect().last
      roundCols(Search.flatSearchAfter(coll, config, q, 10,
          last.getAs[Double]("distance"), last.getAs[String]("id"))
        .drop("metadata"), Seq("score", "distance"))
    }),

    // packed-f32 binary layout: scoring reads bytes in place; results
    // must be bit-identical to vec_flat_cosine_topk (same oracle SQL)
    "vec_flat_packed_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val packed = graft.prepare.Prepare
        .withPackedVector(Tables.embeddingsCollection(s, dir, config))
        .drop("vector", "vectors", "binary_vector") // packed column only
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Search.flatSearchPacked(packed, config, q, 10).drop("metadata"),
        Seq("score", "distance"))
    }),

    // range (radius) search — the FAISS range_search contract: every
    // row within a distance bound (or above a score bound), a pure
    // scan + codegen'd filter with no heap and no sort
    "vec_range_l2" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = CollectionConfig("embeddings", d, Metric.L2)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Search.rangeSearch(coll, config, q, radius = 1.35)
        .drop("metadata"), Seq("score", "distance"))
    }),

    "vec_range_cosine" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Search.rangeSearchByScore(coll, config, q, minScore = 0.15)
        .drop("metadata"), Seq("score", "distance"))
    }),

    // batch range search: 4 queries against the corpus in ONE broadcast
    // scan; emits only the per-(qid, id) matches — output is the join's
    // selectivity, never |corpus| x |queries|
    "vec_range_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = CollectionConfig("embeddings", d, Metric.L2)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(Search.rangeSearchMany(coll, config, qs, radius = 1.35,
        knownNq = 4L), Seq("score", "distance"))
    }),

    // every scalar kernel over raw vectors vs the vec_id=0 query
    "vec_metrics_all" -> ((s, dir) => {
      val q = Tables.queryVector(s, dir, 0L)
      val qc = vecLit(q)
      // hamming/jaccard run on positive-thresholded copies so the truthy
      // pattern is the sign pattern (random floats are never exactly 0)
      val thr: Column => Column = v => transform(v, x => when(x > 0, x).otherwise(lit(0.0f)))
      val df = Tables.read(s, dir, "embeddings")
        .filter(col("vec_id") < 32)
        .select(col("vec_id").cast("string").as("id"), col("embedding").as("vector"))
      roundCols(df.select(
        col("id"),
        vecDistance(Metric.L2, col("vector"), qc).as("m_l2"),
        vecDistance(Metric.L2Squared, col("vector"), qc).as("m_l2sq"),
        vecDistance(Metric.InnerProduct, col("vector"), qc).as("m_dot"),
        vecDistance(Metric.NegativeInnerProduct, col("vector"), qc).as("m_negdot"),
        vecDistance(Metric.Manhattan, col("vector"), qc).as("m_manhattan"),
        vecDistance(Metric.Chebyshev, col("vector"), qc).as("m_chebyshev"),
        vecDistance(Metric.Hamming, thr(col("vector")), thr(qc)).as("m_hamming"),
        vecDistance(Metric.Jaccard, thr(col("vector")), thr(qc)).as("m_jaccard"),
        trueCosine(col("vector"), qc).as("m_truecos")),
        Seq("m_l2", "m_l2sq", "m_dot", "m_negdot", "m_manhattan", "m_chebyshev",
          "m_hamming", "m_jaccard", "m_truecos"))
    }),

    // sign packing: the packed word(s) + popcount per row
    "vec_sign_pack" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val words = (d + 63) / 64
      val df = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 64)
        .select(col("vec_id").cast("string").as("id"),
          packSignBits(col("embedding")).as("bv"))
      val wordCols = (0 until words).map(w => element_at(col("bv"), w + 1).as(s"word$w"))
      val pop = (0 until words).map(w => bit_count(element_at(col("bv"), w + 1)))
        .reduce(_ + _).as("popcount")
      df.select(col("id") +: wordCols :+ pop: _*)
    }),

    // quantized candidate pass: packed hamming vs query bits, top-20
    "vec_packed_hamming_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val q = Tables.queryVector(s, dir, 0L)
      val qBits = graft.expr.VectorKernels.packSignBits(q)
      roundCols(Tables.read(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("id"),
          packedHamming(packSignBits(col("embedding")), typedlit(qBits), d)
            .cast("long").as("ham"),
          packedJaccard(packSignBits(col("embedding")), typedlit(qBits), d)
            .as("pjac"))
        .orderBy(col("ham").asc, col("id").asc).limit(20), Seq("pjac"))
    }),

    // Matryoshka funnel: prefix stages [16,32] with the widen=8 schedule
    // (stage keeps [400, 50]) -> exact rerank; the oracle replicates the
    // per-stage keeps literally
    "vec_funnel_topk" -> ((s, dir) => {
      val (config, coll, q) = l2Setup(s, dir)
      roundCols(Search.funnelSearch(coll, config, q, 10,
        stages = Seq(16, 32), candidates = 50).drop("metadata"),
        Seq("score", "distance"))
    }),

    // binary-quantized: asymmetric-dot candidates (default) -> exact rerank
    "vec_quantized_topk" -> ((s, dir) => {
      val (config, coll, q) = l2Setup(s, dir)
      roundCols(Search.quantizedSearch(coll, config, q, 10, candidates = 50)
        .drop("metadata"), Seq("score", "distance"))
    }),

    // reference-literal symmetric packed-Hamming candidate mode
    // (distances.rs:426-437) — pinned alongside the asymmetric default
    "vec_quantized_hamming_topk" -> ((s, dir) => {
      val (config, coll, q) = l2Setup(s, dir)
      roundCols(Search.quantizedSearch(coll, config, q, 10, candidates = 50,
        asymmetric = false).drop("metadata"), Seq("score", "distance"))
    }),

    // hybrid: funnel+quantized candidate union -> dedup -> exact rerank
    "vec_hybrid_topk" -> ((s, dir) => {
      val (config, coll, q) = l2Setup(s, dir)
      roundCols(Search.hybridSearch(coll, config, q, 10,
        generators = Seq("funnel", "quantized"), candidates = 50,
        stages = Seq(16, 32)).drop("metadata"), Seq("score", "distance"))
    }),

    // ColBERT/MaxSim over label-grouped multi-vector documents
    "vec_maxsim_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val qvecs = (0L to 3L).map(Tables.queryVector(s, dir, _))
      roundCols(Search.multiVectorSearch(labelDocs(s, dir), Tables.ipConfig(d),
        qvecs, 5).drop("metadata"), Seq("score"))
    }),

    // batch MaxSim: 3 query SETS (2 vectors each, deterministic
    // vec_id order) against the label-grouped multi-vector docs in ONE
    // scan — per-query results equal multiVectorSearch
    "vec_maxsim_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 6)
        .groupBy((col("vec_id") / lit(2)).cast("int").cast("string").as("qid"))
        .agg(transform(
          array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
          x => x.getField("embedding")).as("qvectors"))
      roundCols(Search.multiVectorSearchMany(labelDocs(s, dir),
        Tables.ipConfig(d), qs, 5).drop("metadata"), Seq("score"))
    }),

    // batch form: 10 queries answered in one shuffle-light pass
    "vec_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(Search.flatSearchMany(coll, config, qs, 5), Seq("score", "distance"))
    }),

    // batch flat search over a LONG-id collection: the generic-id heap
    // cut (BatchTopKAgg with a BIGINT id slot) takes the same one-scan
    // plan as the canonical string schema — rank ties break by NATIVE
    // long order, which string order would invert
    "vec_search_many_longid" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
        .withColumn("id", col("id").cast("long"))
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 6)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(Search.flatSearchMany(coll, config, qs, 5, knownNq = 6L),
        Seq("score", "distance"))
    }),

    // batch MMR: candidates for 2 queries from ONE flatSearchMany pass,
    // per-qid driver greedy — per-query results equal vec_mmr_topk's
    // single form (the batch recursive-CTE oracle replicates the greedy
    // argmax per qid)
    "vec_mmr_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 2)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(graft.rerank.Mmr.rerankMany(s, coll, config, qs, 0.7, 10, 50,
        knownNq = 2L), Seq("score"))
    }),

    // batch quantized search: sign-bit candidates for 10 queries in ONE
    // scan (asymmetric scorer), per-qid cut, shared exact batch rerank
    "vec_quantized_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(Search.quantizedSearchMany(coll, config, qs, 5,
        candidates = 20, knownNq = 10L), Seq("score", "distance"))
    }),

    // batch funnel: per-stage per-qid window cuts over ONE broadcast
    // scan (stage keeps [400, 50] like vec_funnel_topk), shared exact
    // batch rerank — per-query results equal the single-query funnel
    "vec_funnel_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(Search.funnelSearchMany(coll, config, qs, 5,
        stages = Seq(16, 32), candidates = 50, knownNq = 8L),
        Seq("score", "distance"))
    }),

    // batch hybrid: funnel + quantized generators in batch form, union
    // deduped per (qid, id), ONE exact rerank
    "vec_hybrid_search_many" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.l2Config(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val qs = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").cast("string").as("qid"), col("embedding").as("qvector"))
      roundCols(Search.hybridSearchMany(coll, config, qs, 5,
        generators = Seq("funnel", "quantized"), candidates = 50,
        stages = Seq(16, 32), knownNq = 8L), Seq("score", "distance"))
    }),

    // score mode :similarity on a distance metric (1/(1+raw))
    "vec_flat_l2_similarity_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = CollectionConfig("embeddings", d, Metric.L2,
        score = graft.core.ScoreMode.Similarity)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(Search.flatSearch(coll, config, q, 10).drop("metadata"),
        Seq("score", "distance"))
    }),

    // ingest pipeline: vectors-only input -> normalized mean vector,
    // value defaulting, sign packing (collection.ex:920-1017)
    "vec_prepare_pipeline" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val emb = Tables.read(s, dir, "embeddings")
      val e1 = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("k"), col("embedding").as("v1"))
      val e2 = emb.filter(col("vec_id") >= 250 && col("vec_id") < 350)
        .select((col("vec_id") - 250).as("k"), col("embedding").as("v2"))
      val input = e1.join(e2, "k")
        .select(col("k").cast("string").as("id"), array(col("v1"), col("v2")).as("vectors"))
      val prepared = graft.prepare.Prepare.prepareEmbeddings(input, Tables.cosineConfig(d))
      roundCols(prepared.select(
        col("id"), col("value"),
        aggregate(col("vector"), lit(0.0), (a, x) => a + x).as("vec_sum"),
        size(col("vectors")).as("n_vectors"),
        element_at(col("binary_vector"), 1).as("word0")), Seq("vec_sum"), 5)
    }),

    // copy-on-write delete + point lookup
    "vec_crud_count" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val coll = Tables.embeddingsCollection(s, dir, Tables.cosineConfig(d))
      val afterDelete = graft.prepare.Prepare.deleteIds(coll, (1L to 9L).map(_.toString))
      afterDelete.agg(count(lit(1)).as("cnt"),
        sum(when(col("id") === "10", 1L).otherwise(0L)).as("has_10"))
    }),

    // MMR diversity rerank (driver-side greedy over 50 candidates);
    // no SQL oracle: sequential greedy — covered by ScalaTest oracle
    "vec_mmr_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val config = Tables.cosineConfig(d)
      val coll = Tables.embeddingsCollection(s, dir, config)
      val q = Tables.queryVector(s, dir, 0L)
      roundCols(graft.rerank.Mmr.rerankSearch(s, coll, config, q, 0.7, 10, 50),
        Seq("score"))
    }),

    // MUVERA FDE retrieval: doc FDEs (average) vs query FDE (sum),
    // inner-product candidates; no SQL oracle (hash-based encoder) —
    // determinism + exactness covered by ScalaTest
    "vec_muvera_fde_topk" -> ((s, dir) => {
      val d = Tables.dims(s, dir)
      val cfg = graft.encode.Muvera.Config(dimension = d, numRepetitions = 4,
        numSimhashProjections = 3, seed = 13L)
      val docs = labelDocs(s, dir).withColumn("fde",
        graft.encode.Muvera.encodeColumn(cfg, graft.encode.Muvera.DocumentMode)(col("vectors")))
      val qvecs = (0L to 3L).map(Tables.queryVector(s, dir, _))
      val qfde = graft.encode.Muvera.encode(qvecs, cfg, graft.encode.Muvera.QueryMode)
      roundCols(docs.select(col("id"),
        vecDistance(Metric.InnerProduct, col("fde"), vecLit(qfde)).as("fde_score"))
        .orderBy(col("fde_score").desc, col("id").asc).limit(5), Seq("fde_score"))
    }),

    // normalization modes: scalar invariants of each normalized vector
    "vec_normalize_check" -> ((s, dir) => {
      val df = Tables.read(s, dir, "embeddings").filter(col("vec_id") < 64)
        .select(col("vec_id").cast("string").as("id"), col("embedding").as("v"))
      val l2n = normalizeVector(graft.core.Normalize.L2, col("v"))
      val zs = normalizeVector(graft.core.Normalize.ZScore, col("v"))
      val mm = normalizeVector(graft.core.Normalize.MinMax, col("v"))
      roundCols(df.select(
        col("id"),
        aggregate(l2n, lit(0.0), (acc, x) => acc + x * x).as("l2_sumsq"),
        aggregate(zs, lit(0.0), (acc, x) => acc + x).as("zs_sum"),
        aggregate(zs, lit(0.0), (acc, x) => acc + x * x).as("zs_sumsq"),
        array_min(mm).cast("double").as("mm_min"),
        array_max(mm).cast("double").as("mm_max"),
        aggregate(mm, lit(0.0), (acc, x) => acc + x).as("mm_sum")),
        Seq("l2_sumsq", "zs_sum", "zs_sumsq", "mm_min", "mm_max", "mm_sum"), 5)
    })
  )

  // ---------------------------------------------------------- oracle SQL

  /** (x * c) mod 2^64 over HUGEINT via 32-bit lo/hi split. */
  private def sqlMul64(x: String, c: BigInt): String = {
    val cl = c % (BigInt(1) << 32)
    val ch = c >> 32
    s"""((($x) % 4294967296) * $cl::HUGEINT
       + (((($x) % 4294967296) * $ch::HUGEINT
       + (($x) >> 32) * $cl::HUGEINT) % 4294967296) * 4294967296)
       % (1::HUGEINT << 64)"""
  }

  /** Bit-exact SQL mirror of the MUVERA gate encoding (seed 13, 4 reps,
    * 3 simhash projections, identity projection): SplitMix hash4 weights
    * in u64-over-HUGEINT, per-(doc,rep,partition) SEQUENTIAL f32
    * accumulation via a recursive CTE (online average for documents,
    * sum for the query, which rides along as pseudo-doc '_q'), zero
    * segments for empty partitions, f64 dot of the assembled FDEs. */
  private val muveraOracle = {
    val c1 = BigInt("11400714819323198485")
    val c2 = BigInt("13787848793156543929")
    val c3 = BigInt("10723151780598845931")
    s"""WITH RECURSIVE dd AS (SELECT max(len(embedding)) AS dims FROM embeddings),
       h0 AS (SELECT r, p, d,
           (xor(xor(xor(13::HUGEINT, (r::HUGEINT << 17)), (p::HUGEINT << 31)), (d::HUGEINT << 47))
            + $c1::HUGEINT) % (1::HUGEINT << 64) AS x1
         FROM (SELECT unnest(range(0,4)) AS r), (SELECT unnest(range(0,3)) AS p),
              (SELECT unnest(range(0, (SELECT dims FROM dd))) AS d)),
       h2 AS (SELECT r, p, d, ${sqlMul64("xor(x1, x1 >> 30)", c2)} AS x2 FROM h0),
       h3 AS (SELECT r, p, d, ${sqlMul64("xor(x2, x2 >> 27)", c3)} AS x3 FROM h2),
       wq AS (SELECT r, p, d,
           CAST((CAST(xor(x3, x3 >> 31) >> 1 AS DOUBLE) * 2.0 + CAST(xor(x3, x3 >> 31) % 2 AS DOUBLE))
                / 1.8446744073709552e19 AS FLOAT) * 2.0::FLOAT - 1.0::FLOAT AS w
         FROM h3),
       wl AS (SELECT r, p, list(CAST(w AS DOUBLE) ORDER BY d) AS ww FROM wq GROUP BY r, p),
       allv AS (SELECT CAST(label AS VARCHAR) AS doc, vec_id, embedding AS v FROM embeddings
         UNION ALL SELECT '_q', vec_id, embedding FROM embeddings WHERE vec_id <= 3),
       bits AS (SELECT a.doc, a.vec_id, a.v, wl.r, wl.p,
           CASE WHEN list_sum(list_transform(range(0, (SELECT dims FROM dd)),
               d -> CAST(a.v[d+1] AS DOUBLE) * wl.ww[d+1])) >= 0 THEN 1 ELSE 0 END AS bit
         FROM allv a CROSS JOIN wl),
       parts AS (SELECT doc, vec_id, any_value(v) AS v, r,
           sum(bit << (2 - p))::INT AS part FROM bits GROUP BY doc, vec_id, r),
       seq AS (SELECT doc, r, part, v,
           row_number() OVER (PARTITION BY doc, r, part ORDER BY vec_id) AS n,
           count(*) OVER (PARTITION BY doc, r, part) AS total
         FROM parts),
       fold(doc, r, part, n, total, acc) AS (
         SELECT doc, r, part, 1::BIGINT, total,
           list_transform(v, x -> CAST(CAST(x AS DOUBLE) AS FLOAT))
         FROM seq WHERE n = 1
         UNION ALL
         SELECT s.doc, s.r, s.part, f.n + 1, f.total,
           CASE WHEN s.doc = '_q'
           THEN list_transform(range(0, (SELECT dims FROM dd)), i ->
             CAST(CAST(f.acc[i+1] AS DOUBLE) + CAST(s.v[i+1] AS DOUBLE) AS FLOAT))
           ELSE list_transform(range(0, (SELECT dims FROM dd)), i ->
             CAST(CAST(f.acc[i+1] AS DOUBLE)
               + (CAST(s.v[i+1] AS DOUBLE) - CAST(f.acc[i+1] AS DOUBLE)) / CAST(f.n + 1 AS DOUBLE) AS FLOAT))
           END
         FROM fold f JOIN seq s ON s.doc = f.doc AND s.r = f.r AND s.part = f.part AND s.n = f.n + 1),
       segs AS (SELECT doc, r, part, acc FROM fold WHERE n = total),
       grid AS (SELECT doc, r, part FROM (SELECT DISTINCT doc FROM allv),
           (SELECT unnest(range(0,4)) AS r), (SELECT unnest(range(0,8)) AS part)),
       fde AS (SELECT g.doc, flatten(list(coalesce(s.acc,
             list_transform(range(0, (SELECT dims FROM dd)), i -> 0.0::FLOAT)) ORDER BY g.r, g.part)) AS fv
         FROM grid g LEFT JOIN segs s ON s.doc = g.doc AND s.r = g.r AND s.part = g.part
         GROUP BY g.doc),
       sc AS (SELECT d.doc AS id, list_sum(list_transform(range(1, 32 * (SELECT dims FROM dd) + 1),
             i -> CAST(d.fv[i] AS DOUBLE) * CAST(q.fv[i] AS DOUBLE))) AS fde_score
         FROM fde d, (SELECT fv FROM fde WHERE doc = '_q') q WHERE d.doc != '_q')
       SELECT id, (round(fde_score, 6) + 0) AS fde_score
       FROM sc ORDER BY fde_score DESC, id ASC LIMIT 5"""
  }

  def oracleSql: Map[String, String] = TrainingQueries.oracleSql ++ {
    val qv = s"SELECT ${sqlNorm("embedding")} AS qv, embedding AS qraw FROM embeddings WHERE vec_id = 0"
    Map(
      "vec_muvera_fde_topk" -> muveraOracle,
      // greedy MMR as a recursive CTE: the selected-id list rides the
      // recursion; each step's argmax replicates the driver loop's
      // arithmetic exactly (alpha*raw - (1-alpha)*maxTrueCosine, strict
      // first-max tie-break by candidate rank position)
      "vec_mmr_topk" ->
        s"""WITH RECURSIVE q AS (SELECT ${sqlNorm("embedding")} AS qv FROM embeddings WHERE vec_id = 0),
           n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           sc AS (SELECT id, nv, ${sqlDot("nv", "qv")} AS raw FROM n, q),
           cand AS (SELECT id, nv, raw,
               row_number() OVER (ORDER BY (1.0 - raw) ASC, id ASC) AS pos
             FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 50),
           sel(step, ids) AS (
             SELECT 1, [(SELECT id FROM cand ORDER BY 0.7*raw DESC, pos ASC LIMIT 1)]
             UNION ALL
             SELECT s.step + 1, list_append(s.ids, (
                 SELECT c.id FROM cand c
                 WHERE NOT list_contains(s.ids, c.id)
                 ORDER BY (0.7*c.raw - (1.0 - 0.7) * (
                     SELECT max(CASE WHEN dn = 0 OR dp = 0 THEN 0.0
                                ELSE greatest(-1.0, least(1.0, dd / (sqrt(dn) * sqrt(dp)))) END)
                     FROM (SELECT ${sqlDot("c.nv", "p.nv")} AS dd, ${sqlDot("c.nv", "c.nv")} AS dn,
                                  ${sqlDot("p.nv", "p.nv")} AS dp
                           FROM cand p WHERE list_contains(s.ids, p.id)) pairs
                   )) DESC, c.pos ASC
                 LIMIT 1))
             FROM sel s WHERE s.step < 10),
           final AS (SELECT ids FROM sel ORDER BY step DESC LIMIT 1),
           picked AS (SELECT unnest(ids) AS id, unnest(range(len(ids))) AS position FROM final)
           SELECT picked.id, (round(c.raw, 6) + 0) AS score, CAST(picked.position AS INT) AS position
           FROM picked JOIN cand c ON c.id = picked.id ORDER BY position""",
      "vec_flat_cosine_topk" ->
        s"""WITH q AS ($qv),
           n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           sc AS (SELECT id, ${sqlDot("nv", "qv")} AS raw FROM n, q)
           SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric, id AS value
           FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10""",

      // page 2 == OFFSET 10 under the strict (rank, id) total order
      "vec_search_after_topk" ->
        s"""WITH q AS ($qv),
           n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           sc AS (SELECT id, ${sqlDot("nv", "qv")} AS raw FROM n, q)
           SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric, id AS value
           FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10 OFFSET 10""",

      // identical to the cosine oracle: the packed layout is lossless
      "vec_flat_packed_topk" ->
        s"""WITH q AS ($qv),
           n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           sc AS (SELECT id, ${sqlDot("nv", "qv")} AS raw FROM n, q)
           SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric, id AS value
           FROM sc ORDER BY (1.0 - raw) ASC, id ASC LIMIT 10""",

      "vec_range_l2" ->
        s"""WITH q AS ($qv),
           sc AS (SELECT CAST(vec_id AS VARCHAR) AS id, sqrt(${sqlL2sq("embedding", "qraw")}) AS raw FROM embeddings, q)
           SELECT id, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric, id AS value
           FROM sc WHERE raw <= 1.35""",

      "vec_range_cosine" ->
        s"""WITH q AS ($qv),
           n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           sc AS (SELECT id, ${sqlDot("nv", "qv")} AS raw FROM n, q)
           SELECT id, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric, id AS value
           FROM sc WHERE raw >= 0.15""",

      "vec_range_search_many" ->
        s"""WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
           sc AS (SELECT qid, CAST(vec_id AS VARCHAR) AS id, sqrt(${sqlL2sq("embedding", "qv")}) AS raw FROM embeddings, qs)
           SELECT qid, id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM sc WHERE raw <= 1.35""",

      "vec_flat_l2_topk" ->
        s"""WITH q AS ($qv),
           sc AS (SELECT CAST(vec_id AS VARCHAR) AS id, sqrt(${sqlL2sq("embedding", "qraw")}) AS raw FROM embeddings, q)
           SELECT id, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric, id AS value
           FROM sc ORDER BY raw ASC, id ASC LIMIT 10""",

      "vec_flat_ip_topk" ->
        s"""WITH q AS ($qv),
           sc AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlDot("embedding", "qraw")} AS raw FROM embeddings, q)
           SELECT id, (round(raw, 6) + 0) AS score, (round(-raw, 6) + 0) AS distance, 'inner_product' AS metric, id AS value
           FROM sc ORDER BY -raw ASC, id ASC LIMIT 10""",

      "vec_metrics_all" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           b AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v, qraw FROM embeddings, q WHERE vec_id < 32),
           m AS (SELECT id,
             ${sqlL2sq("v", "qraw")} AS l2sq,
             ${sqlDot("v", "qraw")} AS dotp,
             list_sum(list_transform(range(1, len(v)+1), i -> abs(CAST(v[i] AS DOUBLE) - CAST(qraw[i] AS DOUBLE)))) AS manh,
             list_max(list_transform(range(1, len(v)+1), i -> abs(CAST(v[i] AS DOUBLE) - CAST(qraw[i] AS DOUBLE)))) AS cheb,
             len(list_filter(range(1, len(v)+1), i -> (v[i] > 0) != (qraw[i] > 0))) AS hamm,
             len(list_filter(range(1, len(v)+1), i -> (v[i] > 0) AND (qraw[i] > 0))) AS inter,
             len(list_filter(range(1, len(v)+1), i -> (v[i] > 0) OR (qraw[i] > 0))) AS uni,
             ${sqlDot("v", "v")} AS nv2, ${sqlDot("qraw", "qraw")} AS nq2
             FROM b)
           SELECT id, (round(sqrt(l2sq), 6) + 0) AS m_l2, (round(l2sq, 6) + 0) AS m_l2sq,
             (round(dotp, 6) + 0) AS m_dot, (round(-dotp, 6) + 0) AS m_negdot,
             (round(manh, 6) + 0) AS m_manhattan, (round(cheb, 6) + 0) AS m_chebyshev,
             (round(CAST(hamm AS DOUBLE), 6) + 0) AS m_hamming,
             (round(CASE WHEN uni = 0 THEN 0.0 ELSE 1.0 - CAST(inter AS DOUBLE)/uni END, 6) + 0) AS m_jaccard,
             (round(CASE WHEN nv2 = 0 OR nq2 = 0 THEN 0.0 ELSE greatest(-1.0, least(1.0, dotp / (sqrt(nv2) * sqrt(nq2)))) END, 6) + 0) AS m_truecos
           FROM m ORDER BY id""",

      "vec_sign_pack" ->
        s"""WITH b AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlSignWordRaw("embedding", 0, 64)} AS _sw0 FROM embeddings WHERE vec_id < 64)
           SELECT id, ${sqlSignWord("embedding", 0, 64)} AS word0,
             bit_count(${sqlSignWord("embedding", 0, 64)}) AS popcount
           FROM b ORDER BY id""",

      "vec_packed_hamming_topk" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           h AS (SELECT CAST(vec_id AS VARCHAR) AS id,
             len(list_filter(range(1, len(embedding)+1), i -> (embedding[i] >= 0) != (qraw[i] >= 0))) AS ham,
             len(list_filter(range(1, len(embedding)+1), i -> (embedding[i] >= 0) AND (qraw[i] >= 0))) AS inter,
             len(list_filter(range(1, len(embedding)+1), i -> (embedding[i] >= 0) OR (qraw[i] >= 0))) AS uni
             FROM embeddings, q)
           SELECT id, CAST(ham AS BIGINT) AS ham,
             (round(CASE WHEN uni = 0 THEN 0.0 ELSE 1.0 - CAST(inter AS DOUBLE)/uni END, 6) + 0) AS pjac
           FROM h ORDER BY ham ASC, id ASC LIMIT 20""",

      "vec_funnel_topk" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           base AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings),
           s1 AS (SELECT id, v FROM (SELECT id, v, ${sqlL2sq("v[1:16]", "qraw[1:16]")} AS r1 FROM base, q ORDER BY r1 ASC, id ASC LIMIT 400)),
           s2 AS (SELECT id, v FROM (SELECT id, v, ${sqlL2sq("v[1:32]", "qraw[1:32]")} AS r2 FROM s1, q ORDER BY r2 ASC, id ASC LIMIT 50)),
           fin AS (SELECT id, sqrt(${sqlL2sq("v", "qraw")}) AS raw FROM s2, q)
           SELECT id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM fin ORDER BY raw ASC, id ASC LIMIT 10""",

      "vec_quantized_topk" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           h AS (SELECT id, v FROM (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v,
             ${sqlAsymDot("embedding", "qraw")} AS asym
             FROM embeddings, q ORDER BY asym DESC, id ASC LIMIT 50)),
           fin AS (SELECT id, sqrt(${sqlL2sq("v", "qraw")}) AS raw FROM h, q)
           SELECT id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM fin ORDER BY raw ASC, id ASC LIMIT 10""",

      "vec_quantized_hamming_topk" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           h AS (SELECT id, v FROM (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v,
             len(list_filter(range(1, len(embedding)+1), i -> (embedding[i] >= 0) != (qraw[i] >= 0))) AS ham
             FROM embeddings, q ORDER BY ham ASC, id ASC LIMIT 50)),
           fin AS (SELECT id, sqrt(${sqlL2sq("v", "qraw")}) AS raw FROM h, q)
           SELECT id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM fin ORDER BY raw ASC, id ASC LIMIT 10""",

      "vec_hybrid_topk" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           base AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings),
           s1 AS (SELECT id, v FROM (SELECT id, v, ${sqlL2sq("v[1:16]", "qraw[1:16]")} AS r1 FROM base, q ORDER BY r1 ASC, id ASC LIMIT 400)),
           s2 AS (SELECT id, v FROM (SELECT id, v, ${sqlL2sq("v[1:32]", "qraw[1:32]")} AS r2 FROM s1, q ORDER BY r2 ASC, id ASC LIMIT 50)),
           hq AS (SELECT id, v FROM (SELECT id, v,
             ${sqlAsymDot("v", "qraw")} AS asym
             FROM base, q ORDER BY asym DESC, id ASC LIMIT 50)),
           u AS (SELECT id, v FROM s2 UNION SELECT id, v FROM hq),
           fin AS (SELECT id, sqrt(${sqlL2sq("v", "qraw")}) AS raw FROM u, q)
           SELECT id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM fin ORDER BY raw ASC, id ASC LIMIT 10""",

      "vec_maxsim_topk" ->
        s"""WITH qv AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 4),
           pair AS (SELECT e.label AS label, qv.qid AS qid, max(${sqlDot("q", "embedding")}) AS m
             FROM embeddings e, qv GROUP BY e.label, qv.qid),
           sc AS (SELECT CAST(label AS VARCHAR) AS id, sum(m) AS score FROM pair GROUP BY label)
           SELECT id, id AS value, (round(score, 6) + 0) AS score, CAST(NULL AS DOUBLE) AS distance, 'inner_product' AS metric
           FROM sc ORDER BY score DESC, id ASC LIMIT 5""",

      "vec_maxsim_search_many" ->
        s"""WITH qv AS (SELECT CAST(vec_id // 2 AS VARCHAR) AS qid, vec_id AS vid, embedding AS q FROM embeddings WHERE vec_id < 6),
           pair AS (SELECT e.label AS label, qv.qid AS qid, qv.vid AS vid, max(${sqlDot("q", "embedding")}) AS m
             FROM embeddings e, qv GROUP BY e.label, qv.qid, qv.vid),
           sc AS (SELECT qid, CAST(label AS VARCHAR) AS id, sum(m) AS score FROM pair GROUP BY qid, label),
           rk AS (SELECT qid, id, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rn FROM sc)
           SELECT qid, id, id AS value, (round(score, 6) + 0) AS score, CAST(NULL AS DOUBLE) AS distance, 'inner_product' AS metric
           FROM rk WHERE rn <= 5""",

      "vec_quantized_search_many" ->
        s"""WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
           base AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings),
           sc AS (SELECT qid, id, v, qv, ${sqlAsymDot("v", "qv")} AS asym FROM base, qs),
           cand AS (SELECT qid, id, v, qv FROM (SELECT qid, id, v, qv,
             row_number() OVER (PARTITION BY qid ORDER BY asym DESC, id ASC) AS crn FROM sc) WHERE crn <= 20),
           fin AS (SELECT qid, id, sqrt(${sqlL2sq("v", "qv")}) AS raw FROM cand),
           rk AS (SELECT qid, id, raw, row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn FROM fin)
           SELECT qid, id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM rk WHERE rn <= 5""",

      "vec_funnel_search_many" ->
        s"""WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
           base AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings),
           sc1 AS (SELECT qid, id, v, qv, ${sqlL2sq("v[1:16]", "qv[1:16]")} AS r1 FROM base, qs),
           s1 AS (SELECT qid, id, v, qv FROM (SELECT qid, id, v, qv, row_number() OVER (PARTITION BY qid ORDER BY r1 ASC, id ASC) AS rn1 FROM sc1) WHERE rn1 <= 400),
           sc2 AS (SELECT qid, id, v, qv, ${sqlL2sq("v[1:32]", "qv[1:32]")} AS r2 FROM s1),
           s2 AS (SELECT qid, id, v, qv FROM (SELECT qid, id, v, qv, row_number() OVER (PARTITION BY qid ORDER BY r2 ASC, id ASC) AS rn2 FROM sc2) WHERE rn2 <= 50),
           fin AS (SELECT qid, id, sqrt(${sqlL2sq("v", "qv")}) AS raw FROM s2),
           rk AS (SELECT qid, id, raw, row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn FROM fin)
           SELECT qid, id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM rk WHERE rn <= 5""",

      "vec_hybrid_search_many" ->
        s"""WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
           base AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings),
           sc1 AS (SELECT qid, id, v, qv, ${sqlL2sq("v[1:16]", "qv[1:16]")} AS r1 FROM base, qs),
           s1 AS (SELECT qid, id, v, qv FROM (SELECT qid, id, v, qv, row_number() OVER (PARTITION BY qid ORDER BY r1 ASC, id ASC) AS rn1 FROM sc1) WHERE rn1 <= 400),
           sc2 AS (SELECT qid, id, v, qv, ${sqlL2sq("v[1:32]", "qv[1:32]")} AS r2 FROM s1),
           s2 AS (SELECT qid, id, v, qv FROM (SELECT qid, id, v, qv, row_number() OVER (PARTITION BY qid ORDER BY r2 ASC, id ASC) AS rn2 FROM sc2) WHERE rn2 <= 50),
           scq AS (SELECT qid, id, v, qv, ${sqlAsymDot("v", "qv")} AS asym FROM base, qs),
           hq AS (SELECT qid, id, v, qv FROM (SELECT qid, id, v, qv, row_number() OVER (PARTITION BY qid ORDER BY asym DESC, id ASC) AS crn FROM scq) WHERE crn <= 50),
           u AS (SELECT qid, id, v, qv FROM s2 UNION SELECT qid, id, v, qv FROM hq),
           fin AS (SELECT qid, id, sqrt(${sqlL2sq("v", "qv")}) AS raw FROM u),
           rk AS (SELECT qid, id, raw, row_number() OVER (PARTITION BY qid ORDER BY raw ASC, id ASC) AS rn FROM fin)
           SELECT qid, id, id AS value, (round(-raw, 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM rk WHERE rn <= 5""",

      "vec_search_many" ->
        s"""WITH n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, ${sqlNorm("embedding")} AS qv FROM embeddings WHERE vec_id < 10),
           sc AS (SELECT qid, id, ${sqlDot("nv", "qv")} AS raw FROM n, qs),
           rk AS (SELECT qid, id, raw, row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, id ASC) AS rn FROM sc)
           SELECT qid, id, id AS value, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric
           FROM rk WHERE rn <= 5""",

      // the long-id twin: id stays BIGINT end to end, ties order by the
      // NATIVE numeric id (2 < 10, where string order says "10" < "2")
      "vec_search_many_longid" ->
        s"""WITH n AS (SELECT vec_id AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, ${sqlNorm("embedding")} AS qv FROM embeddings WHERE vec_id < 6),
           sc AS (SELECT qid, id, ${sqlDot("nv", "qv")} AS raw FROM n, qs),
           rk AS (SELECT qid, id, raw, row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, id ASC) AS rn FROM sc)
           SELECT qid, id, CAST(id AS VARCHAR) AS value, (round(raw, 6) + 0) AS score, (round(1.0 - raw, 6) + 0) AS distance, 'cosine' AS metric
           FROM rk WHERE rn <= 5""",

      // batch MMR: the single form's recursive-CTE greedy, parameterized
      // per qid (seed + argmax correlate on qid; the selected-id list
      // rides the recursion per query)
      "vec_mmr_search_many" ->
        s"""WITH RECURSIVE qs AS (SELECT CAST(vec_id AS VARCHAR) AS qid, ${sqlNorm("embedding")} AS qv FROM embeddings WHERE vec_id < 2),
           n AS (SELECT CAST(vec_id AS VARCHAR) AS id, ${sqlNorm("embedding")} AS nv FROM embeddings),
           sc AS (SELECT qs.qid, n.id, n.nv, ${sqlDot("nv", "qv")} AS raw FROM n, qs),
           cand AS (SELECT * FROM (SELECT qid, id, nv, raw, row_number() OVER (PARTITION BY qid ORDER BY (1.0 - raw) ASC, id ASC) AS pos FROM sc) WHERE pos <= 50),
           sel(qid, step, ids) AS (
             SELECT q.qid, 1, [(SELECT c.id FROM cand c WHERE c.qid = q.qid ORDER BY 0.7*c.raw DESC, c.pos ASC LIMIT 1)]
             FROM (SELECT DISTINCT qid FROM cand) q
             UNION ALL
             SELECT s.qid, s.step + 1, list_append(s.ids, (
                 SELECT c.id FROM cand c
                 WHERE c.qid = s.qid AND NOT list_contains(s.ids, c.id)
                 ORDER BY (0.7*c.raw - (1.0 - 0.7) * (
                     SELECT max(CASE WHEN dn = 0 OR dp = 0 THEN 0.0
                                ELSE greatest(-1.0, least(1.0, dd / (sqrt(dn) * sqrt(dp)))) END)
                     FROM (SELECT ${sqlDot("c.nv", "p.nv")} AS dd, ${sqlDot("c.nv", "c.nv")} AS dn,
                                  ${sqlDot("p.nv", "p.nv")} AS dp
                           FROM cand p WHERE p.qid = s.qid AND list_contains(s.ids, p.id)) pairs
                   )) DESC, c.pos ASC LIMIT 1))
             FROM sel s WHERE s.step < 10),
           final AS (SELECT qid, ids FROM (SELECT qid, ids, row_number() OVER (PARTITION BY qid ORDER BY step DESC) AS rn FROM sel) WHERE rn = 1),
           picked AS (SELECT qid, unnest(ids) AS id, unnest(range(len(ids))) AS position FROM final)
           SELECT picked.qid, picked.id, (round(c.raw, 6) + 0) AS score, CAST(picked.position AS INT) AS position
           FROM picked JOIN cand c ON c.qid = picked.qid AND c.id = picked.id ORDER BY picked.qid, position""",

      "vec_flat_l2_similarity_topk" ->
        s"""WITH q AS (SELECT embedding AS qraw FROM embeddings WHERE vec_id = 0),
           sc AS (SELECT CAST(vec_id AS VARCHAR) AS id, sqrt(${sqlL2sq("embedding", "qraw")}) AS raw FROM embeddings, q)
           SELECT id, id AS value, (round(1.0 / (1.0 + raw), 6) + 0) AS score, (round(raw, 6) + 0) AS distance, 'l2' AS metric
           FROM sc ORDER BY raw ASC, id ASC LIMIT 10""",

      "vec_prepare_pipeline" ->
        s"""WITH e1 AS (SELECT vec_id AS k, embedding AS v1 FROM embeddings WHERE vec_id < 100),
           e2 AS (SELECT vec_id - 250 AS k, embedding AS v2 FROM embeddings WHERE vec_id >= 250 AND vec_id < 350),
           j AS (SELECT CAST(e1.k AS VARCHAR) AS id, ${sqlNorm("v1")} AS n1, ${sqlNorm("v2")} AS n2 FROM e1 JOIN e2 ON e1.k = e2.k),
           m AS (SELECT id, list_transform(range(1, len(n1)+1), i -> CAST((CAST(n1[i] AS DOUBLE) + CAST(n2[i] AS DOUBLE)) / 2 AS FLOAT)) AS mv FROM j),
           p AS (SELECT id, ${sqlNorm("mv")} AS pv FROM m),
           b AS (SELECT id, pv, ${sqlSignWordRaw("pv", 0, 64)} AS _sw0 FROM p)
           SELECT id, id AS value,
             (round(list_sum(list_transform(pv, x -> CAST(x AS DOUBLE))), 5) + 0) AS vec_sum,
             2 AS n_vectors,
             ${sqlSignWord("pv", 0, 64)} AS word0
           FROM b ORDER BY id""",

      "vec_crud_count" ->
        s"""SELECT CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN vec_id = 10 THEN 1 ELSE 0 END) AS BIGINT) AS has_10
           FROM embeddings
           WHERE CAST(vec_id AS VARCHAR) NOT IN ('1','2','3','4','5','6','7','8','9')""",

      "vec_normalize_check" ->
        s"""WITH b AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS v FROM embeddings WHERE vec_id < 64),
           n AS (SELECT id, v,
             ${sqlNorm("v")} AS l2n,
             list_sum(list_transform(v, x -> CAST(x AS DOUBLE))) / len(v) AS mean,
             len(v) AS d FROM b),
           z AS (SELECT id, v, l2n, mean, d,
             sqrt(list_sum(list_transform(v, x -> (CAST(x AS DOUBLE) - mean) * (CAST(x AS DOUBLE) - mean))) / d) AS std,
             list_min(v) AS mn, list_max(v) AS mx FROM n),
           f AS (SELECT id,
             list_transform(v, x -> CAST((CAST(x AS DOUBLE) - mean) / std AS FLOAT)) AS zs,
             list_transform(v, x -> CAST((CAST(x AS DOUBLE) - CAST(mn AS DOUBLE)) / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) AS FLOAT)) AS mm,
             l2n FROM z)
           SELECT id,
             (round(list_sum(list_transform(l2n, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), 5) + 0) AS l2_sumsq,
             (round(list_sum(list_transform(zs, x -> CAST(x AS DOUBLE))), 5) + 0) AS zs_sum,
             (round(list_sum(list_transform(zs, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), 5) + 0) AS zs_sumsq,
             (round(CAST(list_min(mm) AS DOUBLE), 5) + 0) AS mm_min,
             (round(CAST(list_max(mm) AS DOUBLE), 5) + 0) AS mm_max,
             (round(list_sum(list_transform(mm, x -> CAST(x AS DOUBLE))), 5) + 0) AS mm_sum
           FROM f ORDER BY id"""
    )
  }
}
