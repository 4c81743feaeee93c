package graft

import org.apache.spark.sql.functions._

import graft.api.GraftDb
import graft.core.{CollectionConfig, Metric, Normalize}
import graft.prepare.Prepare
import graft.search.Search

/** Degenerate-input behavior: empty collections, limits beyond the
  * corpus, single-row corpora — every search path must return cleanly,
  * never throw. */
class EdgeCaseSpec extends SparkSpec {

  private val dims = 4
  private val config = CollectionConfig("edge", dims, Metric.Cosine)

  private def corpus(n: Int) =
    Prepare.prepareEmbeddings(embeddingRows(
      (0 until n).map(i => i.toString -> Bench.synthVector(i.toLong, dims))), config)

  test("every search operator returns empty on an empty collection") {
    val empty = corpus(0)
    val q = Bench.synthVector(-1L, dims)
    assert(Search.flatSearch(empty, config, q, 5).count() === 0)
    assert(Search.funnelSearch(empty, config, q, 5,
      stages = Seq(2, 4), candidates = 10).count() === 0)
    assert(Search.quantizedSearch(empty, config, q, 5, candidates = 10).count() === 0)
    assert(Search.hybridSearch(empty, config, q, 5, candidates = 10).count() === 0)
    assert(Search.multiVectorSearch(empty, config, Seq(q), 5).count() === 0)
    val packed = Prepare.withPackedVector(empty)
    assert(Search.flatSearchPacked(packed, config, q, 5).count() === 0)
  }

  test("limit larger than the corpus returns the whole corpus, ordered") {
    val coll = corpus(3)
    val q = Bench.synthVector(-1L, dims)
    val res = Search.flatSearch(coll, config, q, 100).collect()
    assert(res.length === 3)
    // still rank-ordered with id tie-break
    val ranks = res.map(_.getDouble(3))
    assert(ranks.sorted.toSeq === ranks.toSeq)
  }

  test("single-row corpus works through funnel/quantized/hybrid") {
    val coll = corpus(1)
    val q = Bench.synthVector(-1L, dims)
    assert(Search.funnelSearch(coll, config, q, 5,
      stages = Seq(2, 4), candidates = 10).count() === 1)
    assert(Search.quantizedSearch(coll, config, q, 5, candidates = 10).count() === 1)
    assert(Search.hybridSearch(coll, config, q, 5, candidates = 10).count() === 1)
  }

  test("facade on an empty collection: search empty, count 0, get None") {
    val db = new GraftDb(spark)
    db.createCollection("edge_empty", dims, metric = "cosine")
    assert(db.count("edge_empty") === 0)
    assert(db.get("edge_empty", "nope").isEmpty)
    assert(db.search("edge_empty", Bench.synthVector(-1L, dims), 5).count() === 0)
    assert(db.similaritySearch("edge_empty", Bench.synthVector(-1L, dims), 5).isEmpty)
    db.close("edge_empty")
  }

  test("hnsw graph: empty search, delete-to-empty, re-insert") {
    val g = new graft.index.Hnsw(Metric.Cosine, graft.index.Hnsw.Params())
    assert(g.search(Array(1f, 0f, 0f, 0f), 5).isEmpty)
    g.insert("a", Array(1f, 0f, 0f, 0f))
    g.insert("b", Array(0f, 1f, 0f, 0f))
    g.delete("a"); g.delete("b")
    assert(g.size === 0)
    assert(g.search(Array(1f, 0f, 0f, 0f), 5).isEmpty)
    g.insert("c", Array(0f, 0f, 1f, 0f))
    assert(g.search(Array(0f, 0f, 1f, 0f), 1).map(_._1) === Seq("c"))
  }

  test("dedup on an empty frame yields no pairs, no clusters") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("id", "text")
    assert(graft.dedup.Dedup.minhashVerifiedPairs(
      empty, "id", $"text", 3, 8, 4, 0.5).count() === 0)
    assert(graft.dedup.Dedup.clusters(empty.select($"id"), "id",
      Seq.empty[(String, String)].toDF("id_a", "id_b")).count() === 0)
  }
}
