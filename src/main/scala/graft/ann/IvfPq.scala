package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.functions.VectorFunctions._
import graft.search.Search

/** IVF-PQ: the standard billion-vector ANN layout (coarse k-means cells
  * for pruning + product-quantized codes for in-cell scoring, exact
  * rerank on the survivors). At rest a row carries one cell id and m
  * code bytes; a probe prunes whole cells (whole files/partitions under
  * [[IvfIndex.writePartitioned]]) before any IO, then scores survivors
  * with ADC lookups inside whole-stage codegen — the scan never touches
  * a float vector until the final `candidates`-row rerank.
  *
  * Composition of [[IvfIndex]] (cells) and [[Pq]] (codes): both trained
  * deterministically on ordered samples, so the full pipeline — both
  * k-means, the probe set, the ADC candidate cut — is replicable by an
  * external SQL oracle. `nprobe = k` with `candidates >= n` degenerates
  * to exact flat search.
  */
object IvfPq {

  /** Attach cell + code columns (idempotent); write with
    * [[IvfIndex.writePartitioned]] for cell-pruned storage. */
  def prepare(df: DataFrame, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]]): DataFrame =
    Pq.withCodes(IvfIndex.withCells(df, centroids), codebooks)

  def search(df: DataFrame, config: CollectionConfig,
      centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]],
      query: Array[Float], limit: Int, nprobe: Int,
      candidates: Int = 0): DataFrame = {
    require(limit > 0, "limit must be positive")
    val effCand = math.max(if (candidates > 0) candidates else 10 * limit, limit)
    val q = Search.prepareQuery(config, query)
    val cells = IvfIndex.probeCells(q, centroids, nprobe)
    val table = Pq.adcTable(codebooks, q, config.metric)
    val sim = config.metric == Metric.Cosine || config.metric == Metric.InnerProduct
    val prepared =
      if (df.columns.contains("ivf_cell") && df.columns.contains("pq_codes")) df
      else prepare(df, centroids, codebooks)
    val approx = adcDistance(col("pq_codes"), table, codebooks(0).length)
    val cut = Search.candidateCut(
      prepared.filter(col("ivf_cell").isin(cells: _*))
        .withColumn("rank", if (sim) -approx else approx), effCand)
      .drop("rank", "pq_codes", "ivf_cell")
    Search.rerankExact(cut, config, q, limit)
  }

  /** Write the prepared collection partitioned BY CELL: each IVF cell is
    * its own directory, so a probe prunes whole files before any IO
    * (PartitionFilters in the scan), and inside a cell the ADC scan
    * reads only (id, value, pq_codes) until the rerank — the full
    * at-rest IVF-PQ layout. */
  def writePartitioned(df: DataFrame, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], path: String): Unit =
    prepare(df, centroids, codebooks).write.mode("overwrite")
      .partitionBy("ivf_cell").parquet(path)

  /** Search the cell-partitioned layout: identical results to [[search]]
    * over the same data (the probe filter becomes a partition filter). */
  def searchPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      config: CollectionConfig, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], query: Array[Float], limit: Int,
      nprobe: Int, candidates: Int = 0): DataFrame =
    search(spark.read.parquet(path), config, centroids, codebooks, query,
      limit, nprobe, candidates)
}
