package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed-n-gram distribution looks like
  * a small high-quality TARGET corpus. Both corpora reduce to bag-of-
  * hashed-n-grams unigram models over `buckets` hash bins; each raw doc
  * scores the log-likelihood ratio of its grams under target vs raw, and
  * the resample draws top-n by Gumbel-perturbed log weight (a
  * deterministic, md5-seeded Gumbel-max draw — sampling ∝ exp(logw)
  * without replacement, reproducible at any parallelism).
  *
  * Spark shape, audited for the 100 TB corpus / small target split:
  *   - the ONLY distributed work per corpus is one explode + map-side-
  *     combined groupBy whose key space is `buckets` (default 4096) — the
  *     shuffle carries at most `buckets` rows per map partition, never
  *     the token mass;
  *   - the fitted log-ratio table is a dense `buckets`-sized double array
  *     on the driver (bounded by the `buckets` parameter, NOT the data)
  *     that rides the plan as a codegen REFERENCE OBJECT, never an array
  *     literal;
  *   - scoring is one fused whole-stage-codegen kernel per row
  *     ([[graft.expr.DsirScore]]: tokenize → hash → table-sum,
  *     left-to-right so the sum is order-deterministic) — no join, no
  *     shuffle, composes with any downstream sampler.
  *
  * Features are lowercased whitespace unigrams + bigrams (the paper's
  * default), hashed by the same engine-portable md5 idiom as
  * [[graft.functions.Sampling.hashBucket]], so an external engine can
  * replicate every weight bit-for-bit (modulo float rounding).
  */
object Dsir {

  /** Lowercased non-empty unigrams ++ space-joined bigrams. */
  private[graft] def grams(text: Column): Column = {
    val toks = filter(
      transform(TextAnalysis.tokens(text), w => lower(w)),
      t => length(t) > 0)
    val bi = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    concat(coalesce(toks, array().cast("array<string>")), bi)
  }

  /** Per-doc hash buckets of [[grams]] (with multiplicity — DSIR scores
    * the bag, not the set). Fused codegen kernel
    * ([[graft.expr.DsirGramBuckets]]): one JVM loop per row instead of
    * the interpreted higher-order-function chain
    * `transform(grams(text), g => Sampling.hashBucket(g, buckets, salt))`
    * it replaces bit-for-bit. */
  private[graft] def gramBuckets(text: Column, buckets: Int,
      salt: String): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expr.DsirGramBuckets(
        org.apache.spark.sql.graft.Bridge.expression(text), buckets, salt))

  /** Hashed-n-gram bucket counts of a corpus: (bucket, n) with at most
    * `buckets` rows — the sufficient statistic of the DSIR unigram
    * model. Map-side combine bounds the shuffle at `buckets` rows per
    * partition regardless of corpus size. */
  def bucketCounts(df: DataFrame, text: Column, buckets: Int = 4096,
      salt: String = "dsir"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // outer + null-filter: avoid the inferred filter re-running the
    // fused gram-bucket kernel per row (InferFiltersFromGenerate)
    df.select(explode_outer(gramBuckets(text, buckets, salt)).as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** The fitted per-bucket log-likelihood ratio
    * `ln p_target(b) − ln p_raw(b)` as a dense `buckets`-sized array
    * (add-`alpha` Laplace smoothing keeps unseen buckets finite).
    * Driver memory is `8 * buckets` bytes — bounded by the parameter,
    * not the data. Runs the two corpus-count jobs eagerly. */
  def logRatioTable(raw: DataFrame, rawText: Column, target: DataFrame,
      targetText: Column, buckets: Int = 4096, alpha: Double = 1.0,
      salt: String = "dsir"): Array[Double] = {
    require(alpha > 0, "alpha must be positive")
    def fit(df: DataFrame, text: Column): Array[Double] = {
      val counts = new Array[Double](buckets)
      bucketCounts(df, text, buckets, salt).collect()
        .foreach(r => counts(r.getInt(0)) = r.getLong(1).toDouble)
      val total = counts.sum + alpha * buckets
      counts.map(c => math.log((c + alpha) / total))
    }
    val pt = fit(target, targetText)
    val pr = fit(raw, rawText)
    Array.tabulate(buckets)(b => pt(b) - pr(b))
  }

  /** Adds `dsir_logw` — each raw doc's importance log-weight
    * `Σ_grams ln(p_target/p_raw)` under the fitted hashed-n-gram models
    * — to `raw`. Pure projection against the reference-object ratio
    * table; docs with no grams score 0. Fit is on (`raw`, `target`) as
    * given — pass a hash sample of the raw corpus as `raw` and score the
    * full corpus via [[scoreColumn]] when even the counts pass should
    * not see every row. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, buckets: Int = 4096,
      alpha: Double = 1.0, salt: String = "dsir"): DataFrame = {
    val table = logRatioTable(raw, col(textCol), target,
      col(targetTextCol), buckets, alpha, salt)
    raw.withColumn("dsir_logw",
      scoreColumn(col(textCol), table, salt))
  }

  /** The scoring projection alone, for a pre-fitted [[logRatioTable]]
    * (score a different frame than the fit saw, or reuse one fit across
    * epochs). In-row left-to-right fold — order-deterministic, the exact
    * sum the interpreted `aggregate(transform(...), 0.0, +)` chain
    * produced. The fitted table rides as a codegen reference object
    * ([[graft.expr.DsirScore]]), NOT a plan array literal — a
    * `buckets`-sized literal costs O(buckets) on every tree
    * conversion/analysis, the planning disease AdcDistanceConst fixed
    * for ADC tables. */
  def scoreColumn(text: Column, table: Array[Double],
      salt: String = "dsir"): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expr.DsirScore(
        org.apache.spark.sql.graft.Bridge.expression(text), table, salt))

  /** Deterministic Gumbel-top-`n` resample by `logwCol`: key =
    * `logw + Gumbel(0,1)` with the Gumbel drawn from the same exact-
    * dyadic md5 uniform as [[graft.functions.Sampling.weightedSample]]
    * — a draw of n docs WITHOUT replacement with inclusion ∝
    * exp(logw), reproducible bit-for-bit in any md5-capable engine.
    * One narrow projection + one TakeOrderedAndProject (per-partition
    * heaps, no global sort). Output keeps the row plus its
    * `gumbel_key`. */
  def resampleTop(df: DataFrame, idCol: String, logwCol: Column, n: Int,
      salt: String = "dsir"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val k = conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (k.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    df.withColumn("gumbel_key", logwCol + -log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(n)
  }
}
