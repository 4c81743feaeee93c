package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * counts-based text classifier (the shape of fastText-style quality /
  * language classifiers in web-corpus pipelines: FineWeb-Edu-style
  * quality gates, CCNet language routing). Training is pure counting —
  * no gradients, no iterations — so the whole fit is a handful of
  * aggregations, and every number in the model is exactly replicable
  * by an oracle engine.
  *
  * Model: per-class priors ln(n_c/N) and add-1-smoothed token
  * likelihoods ln((count(t,c)+1)/(tokens_c+V)) over the training
  * vocabulary; scoring sums tf-weighted likelihoods (prediction-time
  * tokens outside the vocabulary are skipped, the standard
  * convention). The per-(doc, class) sum folds over term-sorted
  * contributions, so scores — not just argmaxes — are deterministic
  * and cross-engine checkable.
  *
  * Scale shape: `classStats` is |classes| rows; `likelihood` is
  * vocab x classes, joined on term at scoring time (broadcast when it
  * fits — for unbounded vocabularies prune by document frequency or
  * hash tokens first, e.g. [[TextAnalysis.hashingTfVector]]'s bucket
  * trick). Scoring shuffles only (doc, term, tf) pairs.
  */
object NaiveBayes {

  /** Trained model: `classStats` (label, n_c, t_c, log_prior — one row
    * per class) and `likelihood` (term, label, ll — vocab x classes,
    * absent-in-class terms already smoothed in). Both plain frames:
    * persist/reuse like any other, nothing driver-resident. */
  case class Model(classStats: DataFrame, likelihood: DataFrame)

  private def lowerTokens(textCol: String) =
    TextAnalysis.lowerTokens(col(textCol))

  /** Fit on (id, text, label) rows. */
  def train(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): Model = {
    val spark = df.sparkSession
    val trn = df.select(col(idCol).as("_id"), col(labelCol).as("label"),
      lowerTokens(textCol).as("_lt"))
    // outer + null-filter: the non-outer explode makes the optimizer
    // infer a filter that re-runs the fused tokenization per row
    val tok = trn.select(col("label"), explode_outer(col("_lt")).as("term"))
      .filter(col("term").isNotNull)
    val tc = tok.groupBy(col("label"), col("term")).agg(count(lit(1)).as("cnt"))
    // ONE job yields every model scalar: n_c (docs per class — counted
    // without tokenizing), t_c (tokens per class), V (vocabulary size),
    // and N = sum(n_c). Collecting the |classes|-row result and building
    // `classStats` as a LOCAL relation replaces four jobs (trn.count,
    // voc.count, and two checkpoints that re-ran the count shuffles)
    // with this collect + the likelihood checkpoint. PRECONDITIONS for
    // parity with the old trn.count() form of N: every class has at
    // least one doc whose tokenization is non-empty (else cls⋈tot drops
    // it from N) and labels are non-null (null keys don't join) — both
    // hold for any real labelled corpus and for every gate table; data
    // violating them changes log_prior of the surviving classes, not
    // correctness of the join pipeline. Driver-side math.log compiles
    // to the JVM's Math.log intrinsic, which on this platform agrees
    // with the StrictMath.log Spark's log() column uses (hash-parity
    // gates pin it); on the same doubles the model is bit-identical.
    // The local classStats also broadcast-joins for free in predict.
    val cls = trn.groupBy(col("label")).agg(count(lit(1)).as("n_c"))
    val tot = tc.groupBy(col("label")).agg(sum(col("cnt")).as("t_c"))
    val joined = cls.join(tot, "label")
      .crossJoin(tc.agg(countDistinct(col("term")).as("_v")))
    val stats = joined.collect()
    val n = stats.map(_.getLong(1)).sum.toDouble
    val v = stats.headOption.map(_.getLong(3).toDouble).getOrElse(0.0)
    val outRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    stats.foreach { r =>
      outRows.add(org.apache.spark.sql.Row(r.get(0), r.getLong(1),
        r.getLong(2), math.log(r.getLong(1).toDouble / n)))
    }
    val classStats = spark.createDataFrame(outRows,
      org.apache.spark.sql.types.StructType(
        joined.schema.fields.dropRight(1) :+
          org.apache.spark.sql.types.StructField("log_prior",
            org.apache.spark.sql.types.DoubleType)))
    val likelihood = tc.select(col("term")).distinct()
      .crossJoin(classStats.select(col("label"), col("t_c")))
      .join(tc, Seq("term", "label"), "left")
      .select(col("term"), col("label"),
        log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0) /
          (col("t_c").cast("double") + lit(v))).as("ll"))
      // a MODEL is a fit artifact, not a view: materialize it so every
      // predict() consumer reads vocab x classes rows instead of
      // re-running the training corpus tokenization + count shuffles
      // per downstream branch (the same stage-materialization rule the
      // curation pipeline applies)
      .localCheckpoint()
    Model(classStats, likelihood)
  }

  /** Score (id, text) rows: one row per input with the argmax class
    * (`predicted`, ties broken by label ascending) and its log
    * posterior (`score`, up to the shared evidence term). A document
    * with no in-vocabulary token scores on priors alone. */
  def predict(model: Model, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("_id"), lowerTokens(textCol).as("_lt"))
    val dtf = docs.select(col("_id"), explode_outer(col("_lt")).as("term"))
      .filter(col("term").isNotNull) // see train's tok
      .groupBy(col("_id"), col("term")).agg(count(lit(1)).as("tf"))
    val contrib = dtf.join(model.likelihood, "term")
      .select(col("_id"), col("label"),
        struct(col("term"), (col("tf").cast("double") * col("ll")).as("c")).as("tc"))
    // term-sorted fold: the oracle replicates the accumulation order
    val sums = contrib.groupBy(col("_id"), col("label"))
      .agg(aggregate(sort_array(collect_list(col("tc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("s"))
    val scored = docs.select(col("_id"))
      .crossJoin(model.classStats.select(col("label"), col("log_prior")))
      .join(sums, Seq("_id", "label"), "left")
      .select(col("_id"), col("label"),
        (col("log_prior") + coalesce(col("s"), lit(0.0))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("score").desc, col("label").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("_id").as(idCol), col("label").as("predicted"), col("score"))
  }
}
