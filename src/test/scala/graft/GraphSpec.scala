package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** PageRank + degrees over plain edge frames: exact agreement with an
  * independent in-memory power iteration, mass conservation, dangling
  * handling, and the centrality ordering the curation consumer relies
  * on. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // independent replication of the synchronous update (same double
  // arithmetic shape: (1-d)/n + d*(contrib + dm/n))
  private def reference(edges: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.length).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map(e => pr(e._1) / out(e._1)).sum).toMap
      val dm = nodes.filterNot(out.contains).map(pr).sum
      pr = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    pr
  }

  test("pagerank: matches reference power iteration, conserves mass, handles dangling") {
    // c is dangling (no out-edges): its mass must spread, not vanish
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c0", "a"))
    val df = edges.toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val got = GraphOps.pageRank(df, iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = reference(edges, iters, 0.85)
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-12, s"node $k iter $iters") }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conserved")
    }
  }

  test("pagerank: hub ordering and floor; degrees table") {
    // everyone points at h; h points at one spoke. The h<->s1 2-cycle
    // makes synchronous PR oscillate with decay 0.85^2 per round, so
    // order the CONVERGED ranks (25 rounds: residual ~1e-3 of the gap)
    val edges = Seq(("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1"))
    val pr = GraphOps.pageRank(edges.toDF("src", "dst"), 25)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("h") > pr("s1") && pr("s1") > pr("s2"))
    // s2/s3 have no in-edges: exact floor (1-d)/n every round (n = 4)
    assert(math.abs(pr("s2") - 0.15 / 4) < 1e-12)
    assert(pr("s2") === pr("s3"))
    val deg = GraphOps.degrees(edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(deg === Map("s1" -> ((1L, 1L)), "s2" -> ((1L, 0L)),
      "s3" -> ((1L, 0L)), "h" -> ((1L, 3L))))
  }

  test("personalized pagerank: seeds dominate, mass conserved, matches reference") {
    // chain: s -> a -> b -> c; seed at s
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("c", "s"))
    val pr = GraphOps.personalizedPageRank(edges.toDF("src", "dst"),
      Seq("s"), iterations = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, "mass conserved")
    // rank decays with distance from the seed along the chain
    assert(pr("s") > pr("a") && pr("a") > pr("b") && pr("b") > pr("c"))
    // independent reference with teleport vector
    val nodes = Seq("s", "a", "b", "c"); val d = 0.85
    val out = edges.groupBy(_._1).view.mapValues(_.length).toMap
    def t(v: String) = if (v == "s") 1.0 else 0.0
    var ref = nodes.map(v => v -> t(v)).toMap
    for (_ <- 1 to 20) {
      val c = edges.groupBy(_._2).view.mapValues(es =>
        es.map(e => ref(e._1) / out(e._1)).sum).toMap
      val dm = nodes.filterNot(out.contains).map(ref).sum
      ref = nodes.map(v =>
        v -> ((1.0 - d) * t(v) + d * (c.getOrElse(v, 0.0) + dm * t(v)))).toMap
    }
    nodes.foreach(v => assert(math.abs(pr(v) - ref(v)) < 1e-12, v))
    // non-seed-reachable node: teleport never lands there
    val iso = GraphOps.personalizedPageRank(
      (edges :+ ("x", "y")).toDF("src", "dst"), Seq("s"), 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(iso("x") === 0.0 && iso("y") === 0.0)
  }
}
