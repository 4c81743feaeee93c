package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over labeled data — the metrics a user
  * runs to pick an index/candidate budget (the engine's own bench
  * prints overlap@k vs exact; these are the GENERAL graded-relevance
  * forms over any (query, ranked results) frame + relevance labels).
  * Everything is exact counts and fixed-shape double arithmetic, so
  * the numbers are engine-replicable, not sketchy estimates.
  */
object RankingEval {

  /** Per-query metrics at cutoff `k` from a ranked results frame
    * (`qid`, `id`, `rank` — rank 1-based, as the search surface emits)
    * and a binary relevance frame (`qid`, `id`): (qid, n_relevant,
    * n_retrieved, hits_at_k, recall_at_k, precision_at_k, mrr,
    * ndcg_at_k). Queries with labels but no results score 0 (a
    * retrieval miss, not a missing row); queries with no labels are
    * omitted (undefined denominators).
    *
    *  - recall@k  = relevant retrieved in top-k / n_relevant
    *  - precision@k = relevant retrieved in top-k / k
    *  - MRR       = 1 / rank of the first relevant result (0 if none)
    *  - nDCG@k    = Σ_hits 1/log2(rank+1), normalized by the ideal
    *                prefix Σ_{i<=min(n_rel,k)} 1/log2(i+1)
    *
    * Shape: one join keyed (qid, id) + one grouped aggregation per
    * side — no windows, no collects; metric math is a projection. */
  def perQuery(results: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = labels.select(col("qid"), col("id")).distinct()
    val nRel = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_relevant"))
    val res = results.select(col("qid"), col("id"), col("rank"))
    val nRet = res.groupBy(col("qid")).agg(count(lit(1)).as("n_retrieved"))
    val hits = res.join(rel, Seq("qid", "id"), "left_semi")
    val perQ = hits.groupBy(col("qid")).agg(
      count(when(col("rank") <= k, 1)).as("hits_at_k"),
      min(col("rank")).as("_first_rank"),
      // 1/log2(r+1) written as ln2/ln(r+1): a dedicated log2
      // instruction can differ from the ln ratio by an ulp across
      // engines, the explicit ratio cannot
      sum(when(col("rank") <= k,
        lit(math.log(2.0)) / log(col("rank").cast("double") + 1.0))
        .otherwise(lit(0.0))).as("_dcg"))
    val idcg = (n: org.apache.spark.sql.Column) =>
      aggregate(sequence(lit(1), least(n.cast("int"), lit(k))), lit(0.0),
        (acc, i) => acc + lit(math.log(2.0)) / log(i.cast("double") + 1.0))
    nRel.join(nRet, Seq("qid"), "left")
      .join(perQ, Seq("qid"), "left")
      .select(col("qid"), col("n_relevant"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        (coalesce(col("hits_at_k"), lit(0L)).cast("double") /
          col("n_relevant").cast("double")).as("recall_at_k"),
        (coalesce(col("hits_at_k"), lit(0L)).cast("double") / k)
          .as("precision_at_k"),
        when(col("_first_rank").isNotNull,
          lit(1.0) / col("_first_rank").cast("double"))
          .otherwise(lit(0.0)).as("mrr"),
        (coalesce(col("_dcg"), lit(0.0)) / idcg(col("n_relevant")))
          .as("ndcg_at_k"))
  }

  /** Corpus means of [[perQuery]] (macro-averaged — every labeled
    * query weighs equally, the IR convention): one row. */
  def summary(results: DataFrame, labels: DataFrame, k: Int): DataFrame =
    perQuery(results, labels, k).agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall_at_k")).as("mean_recall"),
      avg(col("precision_at_k")).as("mean_precision"),
      avg(col("mrr")).as("mean_mrr"),
      avg(col("ndcg_at_k")).as("mean_ndcg"))
}
