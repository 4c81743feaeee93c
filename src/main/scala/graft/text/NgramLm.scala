package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language model with add-1 smoothing — the CCNet-style
  * perplexity filter: train token statistics on a trusted corpus,
  * score candidate documents by mean negative log probability
  * (log-perplexity), keep the low-perplexity tail. Like
  * [[NaiveBayes]], the model is pure counts, so every score is
  * exactly replicable by an oracle engine.
  *
  * `p(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V)` where `c1(w1) =
  * Σ_w2 c(w1,w2)` (occurrences as a bigram head) and `V` is the
  * training vocabulary size; unseen heads and unseen pairs both stay
  * finite through the smoothing. A document's `logppl` is the mean
  * `-ln p` over its bigrams IN POSITION ORDER (position-sorted fold —
  * deterministic doubles); documents with fewer than two tokens score
  * null.
  *
  * Known add-1 artifact: a fully OUT-OF-VOCABULARY head w1 has
  * denominator `0 + V`, which can be SMALLER than a frequent head's
  * `c1 + V` — so gibberish in an unseen alphabet is not reliably
  * penalized relative to in-vocabulary text in the wrong order. This
  * is inherent to add-1 (CCNet pairs its Kneser-Ney LM with a
  * language-ID gate for exactly this reason): gate on
  * [[TextAnalysis.langId]] / [[NaiveBayes]] or vocabulary coverage
  * first, then threshold perplexity among in-domain survivors.
  *
  * Scale shape: training is two grouped counts; scoring explodes
  * (doc, pos, w1, w2) and joins the bigram/head tables on their keys —
  * the only shuffles are those joins and the per-doc fold. Compose
  * with [[TextAnalysis.tokenPercentiles]] to turn scores into a
  * percentile keep-threshold.
  */
object NgramLm {

  /** Trained model: `bigrams` (w1, w2, c12), `heads` (w1, c1),
    * `vocabSize` — plain frames plus one scalar. */
  case class Model(bigrams: DataFrame, heads: DataFrame, vocabSize: Long)

  private def lowerTokens(textCol: String) =
    TextAnalysis.lowerTokens(col(textCol))

  private def bigramRows(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("_id"), lowerTokens(textCol).as("_lt"))
      .filter(size(col("_lt")) >= 2)
      .select(col("_id"), posexplode(transform(
        sequence(lit(0), size(col("_lt")) - 2),
        i => struct(element_at(col("_lt"), i + 1).as("w1"),
          element_at(col("_lt"), i + 2).as("w2")))))
      .select(col("_id"), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))

  def train(df: DataFrame, idCol: String, textCol: String): Model = {
    val bg = bigramRows(df, idCol, textCol)
    val bigrams = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val heads = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = df.select(explode_outer(lowerTokens(textCol)).as("term"))
      .filter(col("term").isNotNull) // outer: avoid the inferred filter
      // re-running the fused tokenization (InferFiltersFromGenerate)
      .distinct().count()
    Model(bigrams, heads, v)
  }

  /** Interpolated Kneser–Ney bigram model — the smoothing CCNet's
    * actual KenLM filter uses (Kneser & Ney 1995; Chen & Goodman 1998),
    * fixing [[Model]]'s add-1 artifact: a word's backoff weight is its
    * CONTINUATION probability (how many distinct contexts it follows)
    * rather than raw frequency, so "Francisco" (frequent but only
    * after "San") stops inflating unseen-context scores. Still pure
    * counts — every probability is exactly replicable in SQL:
    *
    *   p(w2|w1) = max(c12 - D, 0)/c1 + D·N1+(w1,·)/c1 · p_cont(w2)
    *   p_cont(w2) = (N1+(·,w2) + 1) / (N_bb + V + 1)   (add-1 so OOV
    *     w2 keeps finite mass), unseen heads back off to p_cont alone.
    */
  case class KnModel(bigrams: DataFrame, heads: DataFrame,
      continuations: DataFrame, totalBigramTypes: Long, vocabSize: Long,
      discount: Double)

  def trainKneserNey(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): KnModel = {
    require(discount > 0 && discount < 1, "discount in (0,1)")
    val bg = bigramRows(df, idCol, textCol)
    val bigrams = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val heads = bigrams.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_head"))
    val continuations = bigrams.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_cont"))
    val nbb = bigrams.count()
    val v = df.select(explode_outer(lowerTokens(textCol)).as("term"))
      .filter(col("term").isNotNull) // outer: avoid the inferred filter
      // re-running the fused tokenization (InferFiltersFromGenerate)
      .distinct().count()
    KnModel(bigrams, heads, continuations, nbb, v, discount)
  }

  /** Score (id, text) rows under the KN model: (idCol, n_bigrams,
    * logppl) — same output contract and position-ordered fold as
    * [[score]]. */
  def scoreKneserNey(model: KnModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val d = model.discount
    val denom = (model.totalBigramTypes + model.vocabSize + 1).toDouble
    val pcont = (coalesce(col("n1p_cont"), lit(0L)).cast("double") + 1.0) / lit(denom)
    val c1d = col("c1").cast("double")
    val p = when(col("c1").isNull, pcont).otherwise(
      greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(d), lit(0.0)) / c1d +
        lit(d) * col("n1p_head").cast("double") / c1d * pcont)
    val contrib = bigramRows(df, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.heads, Seq("w1"), "left")
      .join(model.continuations, Seq("w2"), "left")
      .select(col("_id"), struct(col("pos"), log(p).as("c")).as("pc"))
    val sums = contrib.groupBy(col("_id"))
      .agg(aggregate(sort_array(collect_list(col("pc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("s"),
        count(lit(1)).as("n_bigrams"))
    df.select(col(idCol).as("_id")).join(sums, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0,
          (lit(0.0) - col("s")) / col("n_bigrams").cast("double"))
          .otherwise(lit(null)).cast("double").as("logppl"))
  }

  /** Score (id, text) rows: (idCol, n_bigrams, logppl). */
  def score(model: Model, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val v = model.vocabSize.toDouble
    val contrib = bigramRows(df, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.heads, Seq("w1"), "left")
      .select(col("_id"), struct(col("pos"),
        log((coalesce(col("c12"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(v))).as("c")).as("pc"))
    val sums = contrib.groupBy(col("_id"))
      .agg(aggregate(sort_array(collect_list(col("pc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("s"),
        count(lit(1)).as("n_bigrams"))
    df.select(col(idCol).as("_id")).join(sums, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0,
          (lit(0.0) - col("s")) / col("n_bigrams").cast("double"))
          .otherwise(lit(null)).cast("double").as("logppl"))
  }
}
