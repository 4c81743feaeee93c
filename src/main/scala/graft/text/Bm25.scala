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
    TextAnalysis.lowerTokens(textCol)

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

  /** Batch BM25: every query in ONE corpus pass — the explode + join
    * shape (a transient inverted index). Where [[topK]] plants each
    * query term as a per-doc HOF column (right for a handful of terms),
    * this explodes (doc, term, tf) pairs for the union of all query
    * terms, joins the query list on term, and folds scores per
    * (qid, doc) — the cost is one corpus scan plus a shuffle of the
    * MATCHING pairs only, independent of the number of queries.
    * Per-query results are bit-identical to [[topK]] (absent terms
    * contribute an exact 0.0 there, which the IEEE sum ignores).
    * `queries`: (qid, terms array<string>). Output adds `qid`. */
  def searchMany(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, limit: Int, k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val qterms = queries.select(col("qid"),
      explode(col("terms")).as("_qt")).select(col("qid"), lower(col("_qt")).as("term"))
      .distinct()
    val docs = df.select(col(idCol).as("_id"), lowerTokens(col(textCol)).as("_lt"))
    val stats = docs.agg(count(lit(1)).as("_n"),
      sum(size(col("_lt")).cast("long")).as("_sumdl"))
    val pairs = docs
      .select(col("_id"), size(col("_lt")).cast("long").as("dl"),
        explode_outer(col("_lt")).as("term"))
      .filter(col("term").isNotNull) // outer: avoid the inferred filter
      // re-running the fused tokenization (InferFiltersFromGenerate)
      .join(broadcast(qterms.select(col("term")).distinct()), "term")
      .groupBy(col("_id"), col("dl"), col("term")).agg(count(lit(1)).as("_tf"))
    val dfT = pairs.groupBy(col("term")).agg(countDistinct(col("_id")).as("_df"))
    val contrib = pairs.join(dfT, "term").join(qterms, Seq("term"))
      .crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / n
    val c = log((n - col("_df").cast("double") + 0.5) /
        (col("_df").cast("double") + 0.5) + 1.0) *
      (col("_tf").cast("double") * (k1 + 1.0)) /
      (col("_tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val scored = contrib
      .select(col("qid"), col("_id"), col("dl"), struct(col("term"), c.as("c")).as("tc"))
      .groupBy(col("qid"), col("_id"), col("dl"))
      .agg(aggregate(sort_array(collect_list(col("tc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("score"))
      .withColumn("score_r", round(col("score"), 6))
      .filter(col("score_r") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score_r").desc, col("_id").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= limit)
      .select(col("qid"), col("_id").as(idCol), col("dl"),
        col("score_r").as("score"))
  }

  // ---------------------------------------- persisted lexicon path

  /** Corpus lexicon: `stats` (one row — n docs, sumdl) and `terms`
    * (term, df). Built ONCE per corpus generation; [[topKWithLexicon]]
    * then serves any query with a single corpus scan and zero
    * aggregation jobs over the corpus — the lexical sibling of the
    * persisted-index lifecycle (at 100 TB you do not recount document
    * frequencies per query). */
  case class Lexicon(stats: DataFrame, terms: DataFrame)

  def buildLexicon(df: DataFrame, idCol: String, textCol: String): Lexicon = {
    val docs = df.select(lowerTokens(col(textCol)).as("_lt"))
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(size(col("_lt")).cast("long")).as("sumdl"))
    val terms = docs.select(explode_outer(array_distinct(col("_lt"))).as("term"))
      .filter(col("term").isNotNull) // outer: see search's pairs
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    Lexicon(stats, terms)
  }

  /** Persist / reopen a lexicon: terms as parquet, corpus stats as a
    * JSON sidecar (the same sidecar discipline as the index models). */
  def writeLexicon(lex: Lexicon, path: String): Unit = {
    lex.terms.write.mode("overwrite").parquet(s"$path/terms")
    val r = lex.stats.head
    val json = s"""{"n": ${r.getLong(0)}, "sumdl": ${r.getLong(1)}}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_graft_lexicon.json"), json)
  }

  /** Incrementally fold a new document batch into a lexicon — the
    * continuous-ingest half of the lexical lifecycle (the analog of
    * appendPartitioned for the quantized layouts): df counts are
    * additive, so `merge(lexicon(corpus), lexicon(batch)) ==
    * lexicon(corpus ++ batch)` exactly — never a recount of the corpus
    * at rest. One aggregation over the BATCH only plus a
    * full-outer-union of term counts (map-side combined). */
  def updateLexicon(lex: Lexicon, newDocs: DataFrame, idCol: String,
      textCol: String): Lexicon = {
    val add = buildLexicon(newDocs, idCol, textCol)
    val stats = lex.stats.unionByName(add.stats)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sumdl")).cast("long").as("sumdl"))
    val terms = lex.terms.unionByName(add.terms)
      .groupBy(col("term")).agg(sum(col("df")).cast("long").as("df"))
    Lexicon(stats, terms)
  }

  def readLexicon(spark: org.apache.spark.sql.SparkSession, path: String): Lexicon = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$path/_graft_lexicon.json"))
    def field(name: String): Long =
      s""""$name":\\s*(-?\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"lexicon sidecar missing $name"))
        .group(1).toLong
    import spark.implicits._
    Lexicon(Seq((field("n"), field("sumdl"))).toDF("n", "sumdl"),
      spark.read.parquet(s"$path/terms"))
  }

  /** [[topK]] served from a prebuilt [[Lexicon]]: the per-term df and
    * corpus stats resolve from the lexicon (a bounded driver fetch of
    * `|queryTerms| + 2` numbers), so the only distributed work is the
    * one scoring scan. Bit-identical to [[topK]] when the lexicon was
    * built from the same frame — the gate pins both against one
    * oracle. */
  def topKWithLexicon(df: DataFrame, idCol: String, textCol: String,
      lex: Lexicon, queryTerms: Seq[String], limit: Int,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    require(terms.nonEmpty, "queryTerms must be non-empty")
    val st = lex.stats.head
    val n = st.getLong(0).toDouble
    val sumdl = st.getLong(1).toDouble
    val dfByTerm = lex.terms.filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = df.select(
      (col(idCol) +: size(lowerTokens(col(textCol))).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(lowerTokens(col(textCol)), x => x === lit(t)))
            .cast("long").as(s"_tf$i")
        }): _*)
    val avgdl = lit(sumdl) / lit(n)
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = col(s"_tf$i").cast("double")
      val dfT = lit(dfByTerm.getOrElse(t, 0L).toDouble)
      val idf = log((lit(n) - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduceLeft(_ + _)
    base.select(col(idCol), col("dl"), score.as("score"),
      round(score, 6).as("score_r"))
      .filter(col("score_r") > 0)
      .orderBy(col("score_r").desc, col(idCol).asc)
      .limit(limit)
      .select(col(idCol), col("dl"), col("score_r").as("score"))
  }
}
