package graft.rerank

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{CollectionConfig, Metric}
import graft.expr.VectorKernels
import graft.search.Search

/** Maximal Marginal Relevance rerank (reference:
  * lib/vettore_distance.ex:313-487).
  *
  * The greedy selection is inherently sequential over at most
  * `candidates` rows (a rerank, not a scan), so it runs on the driver —
  * the reference runs it outside its native kernels for the same reason.
  * The candidate generation that feeds it stays distributed.
  */
object Mmr {

  /** Pairwise similarity for the redundancy term
    * (vettore_distance.ex:489-519): cosine -> true cosine, IP -> dot,
    * neg-IP -> -raw, distance metrics -> 1/(1+raw). */
  def pairSimilarity(metric: Metric, a: Array[Float], b: Array[Float]): Double = {
    val code = metric match {
      case Metric.Cosine => VectorKernels.TRUE_COSINE_CODE
      case m             => m.code
    }
    val raw = VectorKernels.distance(code, a, b)
    metric match {
      case Metric.Cosine | Metric.InnerProduct => raw
      case Metric.NegativeInnerProduct         => -raw
      case _                                   => 1.0 / (1.0 + raw)
    }
  }

  /** Greedy MMR: each round scores every remaining candidate as
    * `alpha * queryScore - (1-alpha) * maxSimilarityToSelected` and takes
    * the first maximum (stable against input order, like the reference's
    * Enum.max_by). Returns at most `finalK` (id, originalScore) pairs in
    * selection order. */
  def rerank(initial: Seq[(String, Double)], vectors: Map[String, Array[Float]],
      metric: Metric, alpha: Double, finalK: Int): Seq[(String, Double)] = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0,1]")
    require(finalK > 0, "final_k must be positive")
    initial.foreach { case (id, s) =>
      require(vectors.contains(id), s"missing vector for $id")
      require(!s.isNaN && !s.isInfinite, "score must be finite")
    }
    require(initial.map(_._1).distinct.size == initial.size, "duplicate candidate id")

    val remaining = scala.collection.mutable.ArrayBuffer.from(initial)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    while (selected.size < finalK && remaining.nonEmpty) {
      var bestIdx = 0
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < remaining.size) {
        val (id, qScore) = remaining(i)
        val redundancy =
          if (selected.isEmpty) 0.0
          else selected.iterator
            .map(s => pairSimilarity(metric, vectors(id), vectors(s._1))).max
        val score = alpha * qScore - (1.0 - alpha) * redundancy
        if (score > bestScore) { bestScore = score; bestIdx = i }
        i += 1
      }
      selected += remaining.remove(bestIdx)
    }
    selected.toSeq
  }

  /** DataFrame front-end: distributed flat search supplies the top
    * `candidates` (with vectors), the greedy loop runs on the driver,
    * and the selection returns as a small DataFrame. */
  def rerankSearch(spark: SparkSession, df: DataFrame, config: CollectionConfig,
      query: Array[Float], alpha: Double, finalK: Int, candidates: Int): DataFrame = {
    val q = Search.prepareQuery(config, query)
    import graft.functions.VectorFunctions._
    val cand = df
      .withColumn("raw", vecDistance(config.metric, col("vector"), vecLit(q)))
      .withColumn("rank", rankValue(config.metric, col("raw")))
      .orderBy(col("rank").asc_nulls_last, col("id").asc).limit(candidates)
    val rows = cand.select("id", "raw", "vector").collect()
    val initial = rows.map(r => r.getString(0) -> {
      val (score, _) = graft.core.ScoreMode.resultValues(config.metric, r.getDouble(1), config.score)
      score
    }).toSeq
    val vectors = rows.map(r => r.getString(0) -> r.getSeq[Float](2).toArray).toMap
    val picked = rerank(initial, vectors, config.metric, alpha, finalK)
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("position", IntegerType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(picked.zipWithIndex.map {
        case ((id, s), i) => Row(id, s, i)
      }: _*), schema)
  }

  /** Batch MMR: per-query results equal [[rerankSearch]] with the same
    * knobs. `queries` carries `(qid, qvector)`. Candidates for EVERY
    * query come from one distributed [[Search.flatSearchMany]] pass (one
    * corpus scan, per-query heap cuts) and their vectors rejoin in the
    * same job; the greedy loops then run per-qid on the driver over the
    * collected `nq * candidates`-bounded slim set — the single form's
    * own driver-side shape (and the reference's:
    * lib/vettore_distance.ex:313-487), N of them without N corpus
    * scans. Initial candidate order replicates Spark's `(rank, id)`
    * sort exactly (double total order, binary UTF-8 id ties), so the
    * greedy tie behavior is identical to the single form's collected
    * ordering. String-id collections only, like [[rerankSearch]]. */
  def rerankMany(spark: SparkSession, df: DataFrame, config: CollectionConfig,
      queries: DataFrame, alpha: Double, finalK: Int, candidates: Int,
      knownNq: Long = -1L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0,1]")
    require(finalK > 0, "final_k must be positive")
    require(candidates > 0, "candidates must be positive")
    val qidType = queries.schema("qid").dataType
    // ONE batch pass cuts every query's candidate ids; vectors for the
    // nq*candidates winners rejoin before the single bounded collect
    val winners = Search.flatSearchMany(df, config, queries, candidates,
        knownNq = knownNq)
      .select(col("qid"), col("id"))
      .join(df.select(col("id"), col("vector")), Seq("id"))
      .select(col("qid"), col("id"), col("vector"))
      .collect()
    val byQid = winners.groupBy(_.get(0))
    val qRows = queries.select(col("qid"), col("qvector")).collect()
    val cmpRank = (a: Double, b: Double) =>
      if (a == b) 0 else java.lang.Double.compare(a, b)
    val out = qRows.flatMap { qr =>
      val qid = qr.get(0)
      val q = Search.prepareQuery(config, qr.getSeq[Float](1).toArray)
      val cand = byQid.getOrElse(qid, Array.empty).map { r =>
        val v = r.getSeq[Float](2).toArray
        val raw = VectorKernels.distance(config.metric.code, v, q)
        (r.getString(1), v, raw)
      }.sortWith { case ((id1, _, r1), (id2, _, r2)) =>
        val c = cmpRank(VectorKernels.rankValue(config.metric.code, r1),
          VectorKernels.rankValue(config.metric.code, r2))
        c < 0 || (c == 0 &&
          org.apache.spark.unsafe.types.UTF8String.fromString(id1)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(id2)) < 0)
      }
      val initial = cand.map { case (id, _, raw) =>
        id -> graft.core.ScoreMode.resultValues(config.metric, raw, config.score)._1
      }.toSeq
      val vectors = cand.map { case (id, v, _) => id -> v }.toMap
      rerank(initial, vectors, config.metric, alpha, finalK).zipWithIndex.map {
        case ((id, s), i) => Row(qid, id, s, i)
      }
    }
    val schema = StructType(Seq(
      StructField("qid", qidType),
      StructField("id", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("position", IntegerType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(out.toSeq: _*), schema)
  }
}
