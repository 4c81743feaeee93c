package graft

import org.apache.spark.sql.functions.col

import graft.api.{GraftDb, GraftIndexRegistry, GraftStoreRegistry}
import thirdparty.{EvilStore, ScriptedIndex, ToyBruteIndex, ToyMemStore}

/** Pluggable store/index contract (reference: lib/vettore/store.ex
  * behaviour + lib/vettore/index.ex behaviour, exercised by
  * test/vector_store_compat_test.exs and the custom/evil modules in
  * test/vector_adversarial_test.exs): a third-party implementation
  * registered from OUTSIDE the graft package serves through the facade
  * exactly like a built-in, and a custom store can never smuggle
  * unvalidated records past load. */
class StoreCompatSpec extends SparkSpec {

  private def mkDb(): GraftDb = new GraftDb(spark)

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("third-party index registers, dispatches through the facade, agrees with flat") {
    GraftIndexRegistry.register(ToyBruteIndex)
    try {
      val db = mkDb()
      db.createCollection("toy", 4, metric = "l2", normalize = Some("none"),
        index = "toybrute")
      db.createCollection("ref", 4, metric = "l2", normalize = Some("none"),
        index = "flat")
      val rows = (0 until 32).map(i => db.EmbeddingInput(s"e$i",
        vector = vec(i.toFloat, (i % 7).toFloat, (i % 3).toFloat, 1f)))
      db.batch("toy", rows); db.batch("ref", rows)
      val q = vec(5f, 5f, 1f, 1f)
      val custom = db.search("toy", q, 5).select("id").collect().map(_.getString(0))
      val flat = db.search("ref", q, 5).select("id").collect().map(_.getString(0))
      assert(custom.toSeq === flat.toSeq && custom.length === 5)
      // filter flows through to the implementation
      val filtered = db.search("toy", q, 3, filter = Some(col("id") =!= custom.head))
        .select("id").collect().map(_.getString(0))
      assert(!filtered.contains(custom.head) && filtered.length === 3)
      // default searchMany: per-query loop + qid column, equal to
      // running search per query
      import spark.implicits._
      val queries = Seq(("a", q.toSeq), ("b", vec(30f, 2f, 0f, 1f).toSeq))
        .toDF("qid", "qvector")
      val many = db.searchMany("toy", queries, 3)
        .select("qid", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
      val loop = Seq("a" -> q, "b" -> vec(30f, 2f, 0f, 1f)).flatMap { case (qid, qv) =>
        db.search("toy", qv, 3).select("id").collect().map(qid -> _.getString(0))
      }.toSet
      assert(many === loop)
    } finally GraftIndexRegistry.unregister("toybrute")
  }

  test("default searchMany tolerates empty batches and array<double> qvectors") {
    GraftIndexRegistry.register(ToyBruteIndex)
    try {
      val db = mkDb()
      db.createCollection("toy2", 4, metric = "l2", normalize = Some("none"),
        index = "toybrute")
      db.batch("toy2", (0 until 8).map(i => db.EmbeddingInput(s"e$i",
        vector = vec(i.toFloat, 0f, 0f, 1f))))
      import spark.implicits._
      // empty query frame -> empty result with the full facade result
      // convention (value/metadata included), so a consumer selecting
      // 'value' or unionByName-ing does not fail only on empty batches
      val empty = Seq.empty[(String, Seq[Float])].toDF("qid", "qvector")
      val out = db.searchMany("toy2", empty, 3)
      assert(out.count() === 0L)
      assert(out.columns.toSeq === Seq("id", "value", "score", "distance",
        "metric", "metadata", "qid"))
      // double-typed qvectors convert numerically instead of throwing
      val dq = Seq(("a", Seq(5.0, 0.0, 0.0, 1.0))).toDF("qid", "qvector")
      val hits = db.searchMany("toy2", dq, 2)
        .select("id").collect().map(_.getString(0))
      assert(hits.length === 2 && hits.contains("e5"))
    } finally GraftIndexRegistry.unregister("toybrute")
  }

  test("scripted index: facade returns the implementation's frame verbatim; mutation hook fires") {
    import spark.implicits._
    val scripted = new ScriptedIndex("scripted",
      () => Seq(("fixed", 1.0, 0.0, "l2")).toDF("id", "score", "distance", "metric"))
    GraftIndexRegistry.register(scripted)
    try {
      val db = mkDb()
      db.createCollection("scr", 2, metric = "l2", normalize = Some("none"),
        index = "scripted")
      db.insert("scr", db.EmbeddingInput("a", vector = vec(1f, 2f)))
      assert(db.search("scr", vec(0f, 0f), 10).select("id").head.getString(0) === "fixed")
      // insert invalidated caches -> hook saw the collection
      assert(scripted.mutated.contains("scr"))
      scripted.mutated.clear()
      db.delete("scr", "a")
      assert(scripted.mutated.contains("scr"))
      scripted.mutated.clear()
      db.close("scr")
      assert(scripted.mutated.contains("scr"))
    } finally GraftIndexRegistry.unregister("scripted")
  }

  test("registry guards: reserved names refuse, unknown index/store names throw") {
    intercept[IllegalArgumentException] {
      GraftIndexRegistry.register(new ScriptedIndex("flat", () => null))
    }
    val db = mkDb()
    intercept[IllegalArgumentException] { db.createCollection("x", 2, index = "nope") }
    intercept[IllegalArgumentException] { db.loadSnapshot("/tmp/x", store = "nope") }
    // unregistering restores the unknown-index failure for new collections
    GraftIndexRegistry.register(new ScriptedIndex("fleeting", () => null))
    db.createCollection("y", 2, index = "fleeting")
    GraftIndexRegistry.unregister("fleeting")
    intercept[IllegalArgumentException] { db.createCollection("z", 2, index = "fleeting") }
    db.close("y")
  }

  test("custom store round trip: snapshot into memory, load back, collection serves") {
    GraftStoreRegistry.register(ToyMemStore)
    try {
      val db = mkDb()
      db.createCollection("src", 3, metric = "cosine")
      db.batch("src", Seq(
        db.EmbeddingInput("a", vector = vec(1f, 0f, 0f)),
        db.EmbeddingInput("b", vector = vec(0f, 1f, 0f))))
      db.snapshot("src", "mem://snap1", store = "toymem")
      val loaded = db.loadSnapshot("mem://snap1",
        overrides = Map("name" -> "restored"), store = "toymem")
      assert(loaded === "restored")
      assert(db.count("restored") === 2)
      val top = db.search("restored", vec(1f, 0f, 0f), 1).select("id").head.getString(0)
      assert(top === "a")
    } finally GraftStoreRegistry.unregister("toymem")
  }

  test("custom stores cannot bypass restored-record validation") {
    GraftStoreRegistry.register(EvilStore)
    try {
      val db = mkDb()
      val e = intercept[IllegalStateException] {
        db.loadSnapshot("whatever", store = "evil")
      }
      assert(e.getMessage.contains("invalid record"))
      // nothing half-registered
      assert(!db.listCollections().contains("evil_out"))
    } finally GraftStoreRegistry.unregister("evil")
  }
}
