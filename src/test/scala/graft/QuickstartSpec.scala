package graft

import graft.api.GraftDb

/** Executes the README "Quickstart: the 100 TB index lifecycle" snippet
  * verbatim (small dims/corpus, same calls in the same order), so the
  * documented flow can never drift from the API. */
class QuickstartSpec extends SparkSpec {

  test("README quickstart flow runs verbatim: create → batch → persistIndex → openIndexed → appendIndexed → compactIndexed → searchMany(recallTarget)") {
    val db = new GraftDb(spark)
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(d => math.sin(seed * 7.13 + d * 0.37).toFloat)
    val rows = (0 until 120).map(i =>
      db.EmbeddingInput(id = f"doc$i%03d", vector = vec(i)))
    val path = java.nio.file.Files.createTempDirectory("graft_quickstart").toString

    // 1. create + ingest
    db.createCollection("docs", dims, metric = "cosine", index = "ivfpq")
    db.batch("docs", rows)

    // 2. train once, persist the encoded layout + sidecars
    db.persistIndex("docs", path)
    db.close("docs")

    // 3. cold open: no retraining, no re-encoding
    db.openIndexed("docs", path)
    assert(db.count("docs") === 120)

    // 4. incremental ingest through the persisted model
    val newRows = embeddingRows((120 until 140).map(i => (f"doc$i%03d", vec(i))))
    db.appendIndexed("docs", newRows)
    assert(db.count("docs") === 140)

    // 5. small-file maintenance; results unchanged
    db.compactIndexed("docs")
    assert(db.count("docs") === 140)

    // 6. batch serve at a measured recall target
    import spark.implicits._
    val queries = (0 until 3).map(i => (s"q$i", vec(i).toSeq)).toDF("qid", "qvector")
    val hits = db.searchMany("docs", queries, limit = 10, knownNq = 3,
      recallTarget = 0.9).collect()
    assert(hits.length === 30)
    // self-queries: the stored vector itself must surface at rank 1
    val byQ = hits.groupBy(_.getAs[String]("qid"))
    (0 until 3).foreach { i =>
      val top = byQ(s"q$i").maxBy(_.getAs[Double]("score"))
      assert(top.getAs[String]("id") === f"doc$i%03d")
    }

    // 7. hybrid lexical + vector fusion (this corpus carries no value
    //    payload, so the vector ranking drives the fusion — the call
    //    shape is the README's)
    val fused = db.hybridRrfSearch("docs", Seq("spark", "shuffle"),
      vec(1), limit = 5).collect()
    assert(fused.length === 5)
    assert(fused.head.getAs[String]("id") === "doc001")
  }

  test("README mining snippet runs verbatim: searchMany -> rank -> trainingTriples") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val db = new graft.api.GraftDb(spark)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(d => math.sin(seed * 3.7 + d * 0.9).toFloat)
    db.createCollection("mine_docs", 8, metric = "cosine", index = "flat")
    db.batch("mine_docs", (0 until 40).map(i =>
      db.EmbeddingInput(id = f"doc$i%03d", vector = vec(i))))
    val queries = (0 until 3).map(i => (s"q$i", vec(i).toSeq)).toDF("qid", "qvector")
    // the README snippet, verbatim
    val ranked = db.searchMany("mine_docs", queries, limit = 60)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("id"))))
    val positives = Seq(("q0", "doc000"), ("q1", "doc001"), ("q2", "doc002"))
      .toDF("qid", "id")
    val triples = graft.search.Mining.trainingTriples(
      ranked, positives, k = 8, negsPerPair = 4)
    val got = triples.collect()
    assert(got.length === 3 * 4, "3 positives x 4 capped negatives")
    // a negative is never its query's positive, and neg ranks are 1..4
    assert(got.forall(r => r.getAs[String]("neg_id") != r.getAs[String]("pos_id")))
    assert(got.forall(r => r.getAs[Int]("neg_rank") >= 1 && r.getAs[Int]("neg_rank") <= 4))
    db.close("mine_docs")
  }
}
