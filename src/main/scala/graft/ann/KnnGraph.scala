package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.functions.VectorFunctions._

/** k-nearest-neighbor GRAPH construction: every corpus row's top-k
  * neighbors (self excluded) — the substrate of semantic clustering,
  * NN-descent-style curation, and graph-based diversity sampling.
  *
  * Two paths with identical output contracts (id, neighbor_id, rank,
  * score, distance):
  *
  *  - [[exact]]: the full n x n score matrix, cut per row. Quadratic by
  *    definition — the verification tool and small-corpus path, same
  *    role as [[graft.dedup.Dedup.exactCosinePairs]].
  *  - [[ivf]]: the scale path. Rows join their `nprobe` nearest k-means
  *    cells (query side explodes to probe cells, corpus side sits in
  *    its assigned cell), so each row scores only its cell
  *    neighborhood: cost ~ n x (nprobe/k-fraction of corpus), shuffled
  *    on the cell key — never n^2. At full probes (`nprobe = k-cells`)
  *    the output is IDENTICAL to [[exact]] (the gate pins this), which
  *    is the correctness contract the partial-probe production setting
  *    degrades from gracefully.
  *
  * Both rank with the collection metric's (rank, id) tie-break; per-row
  * cut rides row_number's map-side WindowGroupLimit.
  */
object KnnGraph {

  private def perRowCut(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rank").asc_nulls_last, col("id").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("qid").as("id"), col("id").as("neighbor_id"),
        col("_rn").as("rank"), col("score"), col("distance"))
  }

  private def scorePairs(pairs: DataFrame, config: CollectionConfig): DataFrame = {
    val raw = vecDistance(config.metric, col("vector"), col("qvector"))
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    pairs.withColumn("raw", raw)
      .withColumn("rank", rankValue(config.metric, col("raw")))
      .withColumn("score", score.cast("double"))
      .withColumn("distance", dist.cast("double"))
  }

  /** Exact kNN graph — O(n^2) scoring, verification-scale. */
  def exact(df: DataFrame, config: CollectionConfig, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val q = df.select(col("id").as("qid"), col("vector").as("qvector"))
    val pairs = df.select(col("id"), col("vector")).crossJoin(q)
      .filter(col("id") =!= col("qid"))
    perRowCut(scorePairs(pairs, config), k)
  }

  /** IVF-blocked kNN graph: train-or-supply centroids, join rows to
    * their `nprobe` nearest cells. `nprobe = centroids.length`
    * reproduces [[exact]] bit-for-bit. */
  def ivf(df: DataFrame, config: CollectionConfig,
      centroids: Array[Array[Float]], k: Int, nprobe: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(nprobe > 0 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}]")
    val corpus = IvfIndex.withCells(df.select(col("id"), col("vector")), centroids)
      .withColumnRenamed("ivf_cell", "cell")
    // query side: every row explodes to its nprobe nearest centroid
    // cells — top-nprobe by (distance, index) over the centroid table,
    // computed as a codegen'd sort of a k-element array, no shuffle
    val queries = df.select(col("id").as("qid"), col("vector").as("qvector"))
      .withColumn("cell", explode(probeCellsColumn(col("qvector"), centroids, nprobe)))
    val pairs = corpus.join(queries, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .drop("cell")
    perRowCut(scorePairs(pairs, config), k)
  }

  /** Top-`nprobe` centroid indices for a vector column, by ascending
    * L2^2 with index tie-break: zip (distance, index) structs, sort,
    * slice — all array builtins over the |centroids|-element literal. */
  private[ann] def probeCellsColumn(v: Column, centroids: Array[Array[Float]],
      nprobe: Int): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      val cl = typedlit(c.toSeq)
      struct(
        aggregate(sequence(lit(0), lit(c.length - 1)), lit(0.0), (acc, d) =>
          acc + (element_at(v, d + 1).cast("double") - element_at(cl, d + 1).cast("double")) *
            (element_at(v, d + 1).cast("double") - element_at(cl, d + 1).cast("double")))
          .as("d2"),
        lit(i).as("cell"))
    }
    transform(slice(sort_array(array(dists: _*)), 1, nprobe), s => s.getField("cell"))
  }
}
