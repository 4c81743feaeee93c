package graft

import org.apache.spark.sql.functions._

import graft.search.Fusion
import graft.text.Bm25

/** BM25 lexical retrieval + RRF hybrid fusion semantics. */
class LexicalSpec extends SparkSpec {

  private def docs(rows: Seq[(Int, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(4)
  }

  test("bm25: higher tf ranks higher at equal length; absent term scores 0") {
    val d = docs(Seq(
      1 -> "spark spark flink beam",
      2 -> "spark flink beam storm",
      3 -> "flink beam storm samza"))
    val res = Bm25.topK(d, "doc_id", "text", Seq("spark"), limit = 10).collect()
    assert(res.map(_.getInt(0)).toSeq === Seq(1, 2)) // doc 3 filtered (score 0)
    assert(res(0).getDouble(2) > res(1).getDouble(2))
  }

  test("bm25: rare term outweighs common term (idf)") {
    val d = docs(Seq(
      1 -> "common rare",
      2 -> "common word word",
      3 -> "common word here",
      4 -> "common again now"))
    // doc 1 matches the rare term; docs 2-4 only the common one
    val res = Bm25.topK(d, "doc_id", "text", Seq("common", "rare"), limit = 10)
      .collect()
    assert(res.head.getInt(0) === 1)
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val d = docs(Seq(
      1 -> "spark a b c d e f g h i j k l m n o p q r s t u v w x y z",
      2 -> "spark a b"))
    val res = Bm25.topK(d, "doc_id", "text", Seq("spark"), limit = 10).collect()
    assert(res.head.getInt(0) === 2)
  }

  test("bm25: tf saturation stays under the k1 asymptote") {
    val many = ("spark " * 50).trim
    val d = docs(Seq(1 -> many, 2 -> "other text here"))
    val sc = Bm25.scores(d, "doc_id", "text", Seq("spark"))
      .filter(col("doc_id") === 1).head.getAs[Double]("score")
    // idf for df=1, n=2: ln((2-1+0.5)/(1+0.5)+1) = ln 2; asymptote idf*(k1+1)
    assert(sc > 0 && sc < math.log(2.0) * (Bm25.DefaultK1 + 1.0))
  }

  test("bm25 lexicon path == inline path, survives persist/reopen, df-0 terms safe") {
    val d = docs(Seq(
      1 -> "spark flink spark beam", 2 -> "spark storm", 3 -> "beam beam samza",
      4 -> "flink only here now", 5 -> "totally unrelated words"))
    val terms = Seq("spark", "beam", "zzz-unseen") // one term with df 0
    val inline = Bm25.topK(d, "doc_id", "text", terms, limit = 10).collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
    val lex = Bm25.buildLexicon(d, "doc_id", "text")
    val viaLex = Bm25.topKWithLexicon(d, "doc_id", "text", lex, terms, limit = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(2)))
    assert(inline.toSeq === viaLex.toSeq) // bit-identical, same order
    // persist + reopen: identical again
    val path = java.nio.file.Files.createTempDirectory("graft_lexicon").toString
    Bm25.writeLexicon(lex, path)
    val reopened = Bm25.readLexicon(spark, path)
    val viaDisk = Bm25.topKWithLexicon(d, "doc_id", "text", reopened, terms, 10)
      .collect().map(r => (r.getInt(0), r.getDouble(2)))
    assert(inline.toSeq === viaDisk.toSeq)
  }

  test("bm25 incremental lexicon: merge(old, batch) == rebuild over corpus+batch, exactly") {
    val corpus = docs(Seq(
      1 -> "spark flink spark beam", 2 -> "spark storm", 3 -> "beam beam samza"))
    val batch = docs(Seq(
      4 -> "flink only here now", 5 -> "spark beam spark fresh"))
    val all = corpus.unionByName(batch)
    val merged = Bm25.updateLexicon(
      Bm25.buildLexicon(corpus, "doc_id", "text"), batch, "doc_id", "text")
    val rebuilt = Bm25.buildLexicon(all, "doc_id", "text")
    // df counts are additive: stats and every term row agree exactly
    assert(merged.stats.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === rebuilt.stats.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(merged.terms.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === rebuilt.terms.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // and serving through the merged lexicon == the inline path on the
    // grown corpus (never a recount of the at-rest side)
    val terms = Seq("spark", "beam", "fresh")
    val viaMerged = Bm25.topKWithLexicon(all, "doc_id", "text", merged, terms, 10)
      .collect().map(r => (r.getInt(0), r.getDouble(2)))
    val inline = Bm25.topK(all, "doc_id", "text", terms, 10)
      .collect().map(r => (r.getInt(0), r.getDouble(2)))
    assert(viaMerged.toSeq === inline.toSeq)
    // persisted round trip of the merged lexicon
    val path = java.nio.file.Files.createTempDirectory("graft_lexicon_up").toString
    Bm25.writeLexicon(merged, path)
    val viaDisk = Bm25.topKWithLexicon(all, "doc_id", "text",
      Bm25.readLexicon(spark, path), terms, 10)
      .collect().map(r => (r.getInt(0), r.getDouble(2)))
    assert(viaDisk.toSeq === inline.toSeq)
  }

  test("bm25 searchMany == topK per query, bit for bit; zero-hit query absent") {
    import spark.implicits._
    val d = docs(Seq(
      1 -> "spark flink spark beam", 2 -> "spark storm flink",
      3 -> "beam beam samza extra", 4 -> "flink only here now",
      5 -> "totally unrelated words"))
    val qs = Seq(
      ("qa", Seq("spark", "beam")),
      ("qb", Seq("flink")),
      ("qc", Seq("zzz"))).toDF("qid", "terms")
    val batch = Bm25.searchMany(d, "doc_id", "text", qs, limit = 10)
      .collect().groupBy(_.getString(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getInt(1), r.getDouble(3))).toSeq }
    assert(!batch.contains("qc"))
    for ((q, terms) <- Seq("qa" -> Seq("spark", "beam"), "qb" -> Seq("flink"))) {
      val single = Bm25.topK(d, "doc_id", "text", terms, limit = 10)
        .collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
      assert(batch(q) === single, s"query $q")
    }
  }

  test("rrf: doc present in both rankings beats single-ranking docs; ranks kept") {
    import spark.implicits._
    val lex = Seq((10, 1L), (20, 2L)).toDF("id", "rank")
    val vec = Seq((10, 3L), (30, 1L)).toDF("id", "rank")
    val res = Fusion.rrf(Seq("lex" -> lex, "vec" -> vec), "id").collect()
    assert(res.head.getInt(0) === 10)
    assert(res.head.getAs[Long]("rank_lex") === 1L)
    assert(res.head.getAs[Long]("rank_vec") === 3L)
    // absent ranking -> null rank, score from the present side only
    val r30 = res.find(_.getInt(0) === 30).get
    assert(r30.isNullAt(r30.fieldIndex("rank_lex")))
    assert(math.abs(r30.getAs[Double]("rrf_score") - 1.0 / 61) < 1e-4)
  }

  test("rrf: equal scores tie-break by id ascending; limit cuts") {
    import spark.implicits._
    val a = Seq((5, 1L), (9, 2L)).toDF("id", "rank")
    val b = Seq((7, 1L), (3, 2L)).toDF("id", "rank")
    val res = Fusion.rrf(Seq("a" -> a, "b" -> b), "id", limit = 2).collect()
    // ranks 1: ids 5 and 7 tie at 1/61 -> id asc
    assert(res.map(_.getInt(0)).toSeq === Seq(5, 7))
  }
}
