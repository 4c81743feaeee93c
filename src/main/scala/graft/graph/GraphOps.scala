package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over plain edge frames — the curation-side
  * consumers of [[graft.ann.KnnGraph]]: centrality scores over the
  * document-similarity graph weight prototypical documents up and
  * orphaned/spammy ones down (the D4/DoReMi-family "pick
  * representative data" signal), with no graph library dependency —
  * every step is joins + grouped aggregation.
  */
object GraphOps {

  /** PageRank by synchronous power iteration: `iterations` rounds of
    *
    *   pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)/outdeg(u) + dangling/N )
    *
    * over a directed edge frame, starting uniform at 1/N. Nodes are
    * the union of endpoints; a node with no out-edges (dangling)
    * spreads its mass uniformly, keeping Σpr = 1 every round. Fixed
    * iteration count (not convergence-tested): the score consumer
    * (quality weighting, prototype picking) needs a deterministic,
    * engine-replicable value, and 10-20 rounds is plenty at d=0.85.
    *
    * Scale shape: one outdeg aggregation up front; each round is ONE
    * edge-to-rank equi-join + ONE grouped sum + a broadcast of the
    * (single-row) dangling mass — shuffle volume ∝ |E| per round,
    * nothing driver-resident, `localCheckpoint` per round truncates
    * the iterative lineage exactly like `Dedup.clusters`. Returns
    * (id, pagerank). */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    require(damping > 0 && damping < 1, "damping in (0,1)")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .localCheckpoint()
    val nodes = e.select(col("_src").as("id"))
      .union(e.select(col("_dst").as("id"))).distinct().localCheckpoint()
    val nD = nodes.count().toDouble
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_out"))
      .localCheckpoint()
    // The dangling NODE SET is fixed across rounds (only its mass
    // moves). When it is empty — every kNN-graph source has out-edges —
    // the per-round mass is identically 0.0, so the anti-join + scalar
    // broadcast job per round (2 extra jobs x iterations on the gate
    // graphs) drops out with bit-identical results.
    val anyDangling = !nodes.join(outdeg,
      nodes("id") === outdeg("_src"), "left_anti").isEmpty
    var pr = nodes.withColumn("pagerank", lit(1.0 / nD))
    for (_ <- 1 to iterations) {
      val contrib = e.join(pr.withColumnRenamed("id", "_src"), Seq("_src"))
        .join(outdeg, Seq("_src"))
        .groupBy(col("_dst").as("id"))
        .agg(sum(col("pagerank") / col("_out").cast("double")).as("_c"))
      val base = nodes.join(contrib, Seq("id"), "left")
      // the no-dangling branch must not materialize a literal 0.0/nD
      // term: on an EMPTY graph nD is 0 and ANSI constant folding
      // rejects lit(0.0)/lit(0.0) at plan time (the old per-row column
      // divide never folded) — fold the whole term away instead
      val withDm =
        if (anyDangling) {
          val dangling = pr.join(outdeg,
              pr("id") === outdeg("_src"), "left_anti")
            .agg(coalesce(sum(col("pagerank")), lit(0.0)).as("_dm"))
          base.crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit((1.0 - damping) / nD) + lit(damping) *
                (coalesce(col("_c"), lit(0.0)) + col("_dm") / lit(nD)))
                .as("pagerank"))
        } else
          base.select(col("id"),
            (lit((1.0 - damping) / nD) + lit(damping) *
              coalesce(col("_c"), lit(0.0))).as("pagerank"))
      pr = withDm.localCheckpoint()
    }
    pr
  }

  /** Personalized PageRank: teleport lands on the SEED set instead of
    * uniformly — rank becomes "centrality as seen from the seeds", the
    * find-more-like-my-trusted-docs signal over a kNN graph (seed the
    * curated exemplars, keep the high-rank neighborhood). Same update
    * as [[pageRank]] with teleport vector `t(v) = 1/|seeds|` on seeds
    * and 0 elsewhere; dangling mass also re-enters through `t` (the
    * standard PPR formulation), so Σpr = 1 whenever every seed is a
    * graph node. Start vector = `t`. Same per-round shuffle shape. */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[String],
      iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    require(iterations > 0, "iterations must be positive")
    require(damping > 0 && damping < 1, "damping in (0,1)")
    val e = edges.select(col(srcCol).cast("string").as("_src"),
      col(dstCol).cast("string").as("_dst")).localCheckpoint()
    val nodes = e.select(col("_src").as("id"))
      .union(e.select(col("_dst").as("id"))).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_out"))
      .localCheckpoint()
    val tv = when(col("id").isin(seeds: _*), lit(1.0 / seeds.size))
      .otherwise(lit(0.0))
    // fixed dangling set, same skip as pageRank: empty set -> mass 0.0
    val anyDangling = !nodes.join(outdeg,
      nodes("id") === outdeg("_src"), "left_anti").isEmpty
    var pr = nodes.withColumn("pagerank", tv)
    for (_ <- 1 to iterations) {
      val contrib = e.join(pr.withColumnRenamed("id", "_src"), Seq("_src"))
        .join(outdeg, Seq("_src"))
        .groupBy(col("_dst").as("id"))
        .agg(sum(col("pagerank") / col("_out").cast("double")).as("_c"))
      val base = nodes.join(contrib, Seq("id"), "left")
      // same term-folding discipline as pageRank's no-dangling branch
      val withDm =
        if (anyDangling) {
          val dangling = pr.join(outdeg,
              pr("id") === outdeg("_src"), "left_anti")
            .agg(coalesce(sum(col("pagerank")), lit(0.0)).as("_dm"))
          base.crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit(1.0 - damping) * tv + lit(damping) *
                (coalesce(col("_c"), lit(0.0)) + col("_dm") * tv))
                .as("pagerank"))
        } else
          base.select(col("id"),
            (lit(1.0 - damping) * tv + lit(damping) *
              coalesce(col("_c"), lit(0.0))).as("pagerank"))
      pr = withDm.localCheckpoint()
    }
    pr
  }

  /** Degree table of a directed edge frame: (id, out_deg, in_deg) over
    * the endpoint union — the zero-cost sanity companion to
    * [[pageRank]] (a node's rank floor is (1-d)/N exactly when in_deg
    * = 0). */
  def degrees(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dstCol).as("id"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
