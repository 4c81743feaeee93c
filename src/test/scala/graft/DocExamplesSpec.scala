package graft

import org.apache.spark.sql.functions.col

import graft.api.GraftDb

/** Executes the scaladoc examples on every public GraftDb method — the
  * reference's doctest discipline (test/doctest_test.exs): if a facade
  * example in the docs stops compiling or stops behaving as written,
  * this spec fails. Examples run verbatim (same calls, same literals)
  * against the same 4-dim corpus the docs describe. */
class DocExamplesSpec extends SparkSpec {

  test("facade scaladoc examples run as documented") {
    import spark.implicits._
    // --- createCollection
    val db = new GraftDb(spark)
    db.createCollection("articles", dimensions = 4)
    db.createCollection("codes", 4, metric = "l2", index = "sq8")
    // --- listCollections
    assert(db.listCollections() === Seq("articles", "codes"))
    // --- insert
    db.insert("articles", db.EmbeddingInput("a1", "hello world",
      vector = Array(1f, 0f, 0f, 0f)))
    // --- batch
    db.batch("articles", Seq(
      db.EmbeddingInput("a2", vector = Array(0f, 1f, 0f, 0f)),
      db.EmbeddingInput("a3", vector = Array(0f, 0f, 1f, 0f))))
    // --- all / getAll / count / config
    assert(db.all("articles").select("id", "vector").count() === 3)
    assert(db.getAll("articles").count() === 3)
    assert(db.count("articles") === 3L)
    assert(db.config("articles").metric.name === "cosine")
    // --- get / getByValue / getByVector
    assert(db.get("articles", "a1").map(_.getAs[String]("value"))
      === Some("hello world"))
    assert(db.getByValue("articles", "hello world").map(_.getAs[String]("id"))
      === Some("a1"))
    assert(db.getByVector("articles", Array(1f, 0f, 0f, 0f))
      .map(_.getAs[String]("id")) === Some("a1"))
    // --- search (plain + filtered)
    val q = Array(1f, 0f, 0f, 0f)
    val top = db.search("articles", q, limit = 2)
      .select("id", "score").collect()
    assert(top.head.getString(0) === "a1" && top.length === 2)
    assert(db.search("articles", q, 10, filter = Some(col("id") =!= "a2"))
      .select("id").collect().map(_.getString(0)).toSet === Set("a1", "a3"))
    // --- prepareQuery: unit-normalized under the cosine default
    assert(db.prepareQuery("articles", Array(3f, 0f, 0f, 0f)).toSeq
      === Seq(1f, 0f, 0f, 0f))
    // --- similaritySearch
    assert(db.similaritySearch("articles", Array(1f, 0f, 0f, 0f), 2)
      .head === ("a1", 1.0))
    // --- searchMany
    val queries = Seq(("q0", Seq(1f, 0f, 0f, 0f))).toDF("qid", "qvector")
    val many = db.searchMany("articles", queries, limit = 2, knownNq = 1L)
    assert(many.select("qid", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
      .contains(("q0", "a1")))
    // --- funnelSearch / quantizedSearch / quantizedSearchMany
    assert(db.funnelSearch("articles", q, 10, stages = Seq(1, 2, 4))
      .select("id").head.getString(0) === "a1")
    assert(db.quantizedSearch("articles", q, 10, candidates = 50)
      .select("id").head.getString(0) === "a1")
    assert(db.quantizedSearchMany("articles", queries, 10, knownNq = 1L)
      .select("id").collect().map(_.getString(0)).contains("a1"))
    // --- multiVectorSearch
    assert(db.multiVectorSearch("articles",
      Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f)), 5).count() === 3)
    // --- hybridSearch
    assert(db.hybridSearch("articles", q, 10,
      generators = Seq("funnel", "quantized"))
      .select("id").head.getString(0) === "a1")
    // --- textSearch / hybridRrfSearch
    assert(db.textSearch("articles", Seq("hello", "world"), 5)
      .select("id").head.getString(0) === "a1")
    assert(db.hybridRrfSearch("articles", Seq("hello"), q, 5)
      .select("id").head.getString(0) === "a1")
    // --- rerank
    assert(db.rerank("articles", q, alpha = 0.7, finalK = 3).count() === 3)
    // --- snapshot / loadSnapshot
    val snap = java.nio.file.Files.createTempDirectory("graft_doc_snap")
      .toString + "/articles_snap"
    db.snapshot("articles", snap)
    val restored = db.loadSnapshot(snap, overrides = Map("name" -> "articles2"))
    assert(restored === "articles2" && db.count(restored) === 3L)
    // --- index lifecycle on the sq8 collection
    val rows = (0 until 64).map(i => db.EmbeddingInput(f"c$i%03d",
      vector = Array(i.toFloat, (i % 5).toFloat, (i % 3).toFloat, 1f)))
    db.batch("codes", rows)
    val idxPath = java.nio.file.Files.createTempDirectory("graft_doc_idx")
      .toString + "/codes_idx"
    db.persistIndex("codes", idxPath)
    db.openIndexed("codes2", idxPath)
    val newRows = Seq(("c_new", "c_new", Seq(100f, 1f, 1f, 1f)))
      .toDF("id", "value", "vector")
    db.appendIndexed("codes2", newRows)
    db.compactIndexed("codes2")
    val qc = Array(10f, 0f, 1f, 1f)
    assert(db.search("codes2", qc, 10).count() === 10)
    assert(db.count("codes2") === 65L)
    // --- overlapCurve / knobsFor
    val curve = db.overlapCurve("codes", limit = 5)
    assert(curve.nonEmpty)
    val p = db.knobsFor("codes", recallTarget = 0.9, limit = 5)
    assert(db.searchMany("codes", Seq(("q0", qc.toSeq)).toDF("qid", "qvector"),
      5, candidates = p.candidates).count() === 5)
    // --- delete / close / deleteCollection
    db.delete("articles", "a3")
    assert(db.count("articles") === 2L)
    db.close("articles"); db.close("articles") // idempotent
    db.deleteCollection("codes")
    assert(!db.listCollections().contains("articles"))
  }
}
