package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pair mining for retriever/embedding training — the data an
  * embedding model trains ON, produced by the engine that will serve
  * it. Hard negatives (the top-ranked hits that are NOT labeled
  * positives) are the standard contrastive-training signal (DPR,
  * Karpukhin et al. 2020 §5.2; ANCE, Xiong et al. 2021): random
  * negatives are too easy, and the strongest non-positives are exactly
  * what the model must learn to push away.
  */
object Mining {

  /** Top-`k` hard negatives per query from ANY ranked results frame
    * (`qid`, `id`, `rank` — the same contract as
    * [[RankingEval.perQuery]]; `KnnGraph.exact` emits it directly, and
    * any `searchMany` output qualifies once a rank is derived from its
    * score order) and a labeled positives frame (`qid`, `id`).
    *
    * Keeps every column of `results` and adds `neg_rank` (1-based
    * among the surviving negatives). Queries whose whole result list
    * is positive contribute no rows. Search `depth` should exceed
    * `k + expected positives per query` or the negative list runs
    * short — mine from a deeper result list than you train on.
    *
    * Shape: one (qid, id)-keyed anti-join + one per-qid window whose
    * `row_number <= k` filter plans as WindowGroupLimit (mega result
    * lists pre-cut map-side) — no collects, no cross joins. */
  def hardNegatives(results: DataFrame, positives: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val pos = positives.select(col("qid"), col("id")).distinct()
    val negs = results.join(pos, Seq("qid", "id"), "left_anti")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rank").asc_nulls_last, col("id").asc)
    negs.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
  }

  /** Contrastive training triples: each (query, positive) pair crossed
    * with that query's [[hardNegatives]] — the (q, d+, d−) rows a DPR/
    * InfoNCE loader consumes, flattened so a trainer needs no further
    * joins. `negsPerPair` caps the fan-out per (qid, pos_id) pair (the
    * output is exactly the negatives frame keyed once per positive).
    * One keyed equi-join; fan-out bounded by k × positives per query. */
  def trainingTriples(results: DataFrame, positives: DataFrame, k: Int,
      negsPerPair: Int = Int.MaxValue): DataFrame = {
    require(negsPerPair > 0, "negsPerPair must be positive")
    val negs = hardNegatives(results, positives, k)
      .select(col("qid"), col("id").as("neg_id"), col("neg_rank"))
      .filter(col("neg_rank") <= negsPerPair)
    positives.select(col("qid"), col("id").as("pos_id"))
      .join(negs, Seq("qid"))
  }
}
