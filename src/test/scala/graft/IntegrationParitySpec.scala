package graft

import org.apache.spark.sql.functions._

import graft.core.CollectionConfig
import graft.search.Search

/** The offline analogue of the reference's real-model integration gate
  * (test/ex_fastembed_integration_test.exs:45-128: exact top-1 == HNSW
  * top-1 == every adaptive search mode on bge-small embeddings). No
  * model runs in this sandbox, so the corpus is the CLUSTERED synthetic
  * shape real embedding models produce (topics of graded members,
  * FIXTURES §6 / bench/search_modes_bench.exs:240-246) with one member
  * sitting essentially on the query point. On such data a top-1
  * disagreement means a mode's candidate machinery is broken — the
  * fixture is unambiguous by construction, unlike uniform-random
  * corpora where pairwise similarities concentrate. */
class IntegrationParitySpec extends SparkSpec {

  private val dims = 32

  /** Deterministic well-spread noise in [-1, 1) (splitmix-style mix). */
  private def synth(seed: Long): Array[Float] = {
    var x = seed * 0x9e3779b97f4a7c15L + 1L
    Array.tabulate(dims) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 40) & 0x3ff).toInt / 512.0f) - 1.0f
    }
  }

  test("exact flat, hnsw, lsh, ivf (fixed + adaptive), sq8, pq, ivfpq, funnel, quantized agree on the planted top-1") {
    val config = CollectionConfig("parity", dims) // cosine, l2-normalized
    // 100 topics x 20 members; member j blends (1 - 0.04j) of the topic
    // base with 0.04j of its own noise — member 0 IS the base
    val rows = for (t <- 0 until 100; j <- 0 until 20) yield {
      val base = synth(1000L + t)
      val own = synth(100000L + t * 100L + j)
      (s"t${t}_m$j",
        Array.tabulate(dims)(i => (1f - 0.04f * j) * base(i) + 0.04f * j * own(i)))
    }
    val coll = graft.prepare.Prepare
      .prepareEmbeddings(embeddingRows(rows), config).persist()
    coll.count()
    // query = topic 42's base + a tiny perturbation: t42_m0 is the
    // planted nearest by a wide margin (next member is 0.04 away)
    val base42 = synth(1000L + 42)
    val noise = synth(-4242L)
    val q = Array.tabulate(dims)(i => base42(i) + 0.005f * noise(i))

    def top1(df: org.apache.spark.sql.DataFrame): String =
      df.limit(1).collect().head.getString(0)
    val exact = top1(Search.flatSearch(coll, config, q, 1))
    assert(exact === "t42_m0", "fixture broken: exact search misses the planted hit")

    val modes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    modes("funnel") = top1(Search.funnelSearch(coll, config, q, 1,
      candidates = 200)) // default [d/4, d/2, d] stages
    modes("quantized") = top1(Search.quantizedSearch(coll, config, q, 1, 200))
    modes("lsh") = top1(graft.ann.CosineLsh.search(coll, config,
      graft.ann.CosineLsh.LshConfig(), q, 1))
    modes("hnsw") = graft.index.Hnsw.build(coll, config)
      .search(Search.prepareQuery(config, q), 1).head._1
    modes("hnsw_sharded") = {
      import spark.implicits._
      top1(graft.index.ShardedHnsw.searchMany(coll, config,
        Seq(("q0", q.toSeq)).toDF("qid", "qvector"), 1, shards = 4)
        .select("id"))
    }
    modes("vamana_sharded") = {
      import spark.implicits._
      top1(graft.index.ShardedVamana.searchMany(coll, config,
        Seq(("q0", q.toSeq)).toDF("qid", "qvector"), 1, shards = 4)
        .select("id"))
    }
    val cents = graft.ann.IvfIndex.train(coll, config,
      graft.ann.IvfIndex.IvfConfig(k = 16, iterations = 5))
    modes("ivf_nprobe4") = top1(graft.ann.IvfIndex.search(coll, config,
      cents, q, 1, nprobe = 4))
    modes("ivf_adaptive") = top1(graft.ann.IvfIndex.searchAdaptive(coll, config,
      cents, q, 1, ratio = 1.5, maxProbe = 8))
    val sq8 = graft.ann.Sq8.train(coll)
    modes("sq8") = top1(graft.ann.Sq8.search(
      graft.ann.Sq8.withCodes(coll, sq8), config, sq8, q, 1, candidates = 100))
    val cb = graft.ann.Pq.trainOrdered(coll, config,
      graft.ann.Pq.PqConfig(m = 8, k = 16, iterations = 3, sampleSize = 512),
      col("id"))
    modes("pq") = top1(graft.ann.Pq.search(
      graft.ann.Pq.withCodes(coll, cb), config, cb, q, 1, candidates = 100))
    modes("ivfpq") = top1(graft.ann.IvfPq.search(coll, config, cents, cb,
      q, 1, nprobe = 4, candidates = 100))

    val disagree = modes.filter(_._2 != exact)
    assert(disagree.isEmpty,
      s"modes disagree with exact top-1 '$exact': $disagree")
    coll.unpersist()
  }
}
