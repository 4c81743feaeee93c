package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 lexical retrieval over a document corpus — the classic
  * keyword side of hybrid (lexical + vector) search.
  *
  * Scale shape: for a QUERY-TERM set (small, known up front) nothing
  * per-term ever explodes corpus-wide. Per-doc term frequencies and
  * doc length are higher-order functions over the token array — a pure
  * codegen'd projection, no shuffle. The only aggregation is ONE
  * small-row job producing the corpus stats (N, Σdl, df per query
  * term — `2 + |terms|` numbers), cross-joined back as a broadcast-like
  * single row. Top-k is TakeOrderedAndProject (map-side heaps, no full
  * sort). At 100 TB this is one scan + one scalar agg — the same cost
  * as a count.
  *
  * Determinism: the per-doc score is an explicit left-to-right sum
  * over the lexicographically SORTED query terms, so an oracle engine
  * can replicate the arithmetic term-for-term; ranking uses the score
  * rounded to 6 decimals (ties broken by id ascending) so the order is
  * reproducible across engines.
  */
object Bm25 {

  /** Default Okapi parameters (Robertson/Sparck Jones). */
  val DefaultK1 = 1.2
  val DefaultB = 0.75

  private def lowerTokens(textCol: Column): Column =
    transform(TextAnalysis.tokens(textCol), t => lower(t))

  /** `df` extended with `score` (raw double) and `score_r` (round-6
    * ranking key) for the given query terms. Zero-match docs score 0 —
    * callers filter. Output: idCol, dl, score, score_r. */
  def scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    require(terms.nonEmpty, "queryTerms must be non-empty")
    val tfCols = terms.indices.map(i => s"_tf$i")
    val base = df.select(
      (col(idCol) +: size(lowerTokens(col(textCol))).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(lowerTokens(col(textCol)), x => x === lit(t)))
            .cast("long").as(tfCols(i))
        }): _*)
    // One small-row stats job: N, sum(dl), df per term.
    val aggExprs = count(lit(1)).as("_n") +: sum(col("dl")).as("_sumdl") +:
      tfCols.map(c => sum(when(col(c) > 0, 1L).otherwise(0L)).as(s"_df$c"))
    val stats = base.agg(aggExprs.head, aggExprs.tail: _*)
    val joined = base.crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / n
    // Explicit left-to-right fold in sorted-term order: the oracle
    // replicates this chain literally, so doubles match bit-for-bit
    // before the round-6 ranking key is even applied.
    val score = terms.indices.map { i =>
      val tf = col(tfCols(i)).cast("double")
      val dfT = col(s"_df_tf$i").cast("double")
      val idf = log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduceLeft(_ + _)
    joined.select(col(idCol), col("dl"), score.as("score"),
      round(score, 6).as("score_r"))
  }

  /** Top-`limit` matching docs (score > 0) by BM25, ranked on the
    * round-6 key with id tie-break. Output: idCol, dl, score (round-6). */
  def topK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], limit: Int, k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame =
    scores(df, idCol, textCol, queryTerms, k1, b)
      .filter(col("score_r") > 0)
      .orderBy(col("score_r").desc, col(idCol).asc)
      .limit(limit)
      .select(col(idCol), col("dl"), col("score_r").as("score"))
}
