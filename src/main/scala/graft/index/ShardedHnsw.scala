package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CollectionConfig
import graft.expr.VectorKernels
import graft.functions.VectorFunctions.resultValues
import graft.search.Search

/** Distributed HNSW batch search — the scale path for `index: hnsw`
  * that the driver-resident parity shim ([[Hnsw.build]], capped at
  * `spark.graft.hnsw.maxBuildRows`) cannot be.
  *
  * The corpus hash-partitions into `shards` by id; each task builds an
  * independent HNSW graph over ITS rows (sorted by id — the reference's
  * rebuild order, collection.ex:426-433 — so shard graphs are
  * deterministic) and answers the whole broadcast query batch locally;
  * per-shard top-k lists merge to the global top-k. Nothing ever
  * collects the corpus: graph memory is per-executor, bounded by the
  * shard size, which is the standard shard-per-worker ANN layout.
  *
  * Graphs are acceleration state rebuilt from canonical rows (the
  * reference's own contract — hnsw holds nothing authoritative), kept
  * in an EXECUTOR-JVM cache keyed by (cacheKey, shard): repeated
  * batches against an unchanged collection reuse the built graphs
  * (Spark still scans the partition — the rows feed the cache-miss
  * path; the scan is the price of not pinning state to executors).
  * Callers MUST change `cacheKey` when the data changes, or pass ""
  * to rebuild every call.
  *
  * Recall semantics: a sharded graph searches each sub-graph
  * independently, so per-shard results are HNSW-approximate but the
  * merge is exact over them — with shards=1 and the same params this
  * is bit-identical to the driver shim's graph. */
object ShardedHnsw {

  // executor-JVM-local: each executor caches the graphs of the shards
  // it has served; local mode holds all of them in the one JVM
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, Int), Hnsw]

  /** Drop every cached shard graph whose cacheKey starts with `prefix`
    * (facade invalidation uses a name-derived prefix). */
  def clearCache(prefix: String): Unit =
    cache.keys.filter(_._1.startsWith(prefix)).foreach(cache.remove)

  /** Batch search: queries are (qid, qvector) rows, bounded (they
    * broadcast); returns (qid, id, score, distance, metric) like the
    * facade's single hnsw search. `shards = 0` uses the session's
    * default parallelism. */
  def searchMany(df: DataFrame, config: CollectionConfig, queries: DataFrame,
      limit: Int, shards: Int = 0, cacheKey: String = "",
      params: Hnsw.Params = Hnsw.Params()): DataFrame = {
    require(limit > 0, "limit must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nShards =
      if (shards > 0) shards else spark.sparkContext.defaultParallelism
    val qs = queries.select(col("qid").cast("string"), col("qvector"))
      .collect()
      .map(r => (r.getString(0),
        Search.prepareQuery(config, r.getSeq[Float](1).toArray)))
    val bq = spark.sparkContext.broadcast(qs)
    val metric = config.metric
    val p = params
    val key = cacheKey
    val lim = limit
    val perShard = df
      .select(col("id").cast("string"), col("vector").cast("array<float>"))
      .as[(String, Array[Float])]
      .repartition(nShards, col("id"))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        def freshGraph(): Hnsw = {
          val rows = it.toArray.sortBy(_._1)
          val g = new Hnsw(metric, p)
          g.insertMany(rows.toIndexedSeq)
          g
        }
        // getOrElseUpdate may build twice under a concurrent-first-use
        // race (one result wins); searches on a published graph are
        // read-only, so sharing it across tasks is safe
        val g = if (key.isEmpty) freshGraph()
          else cache.getOrElseUpdate((key, pid), freshGraph())
        bq.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, lim).iterator.map { case (id, raw) =>
            (qid, id, raw, VectorKernels.rankValue(metric.code, raw))
          }
        }
      }
    // global merge: nShards * nq * limit rows, one keyed window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rank").asc_nulls_last, col("id").asc)
    val (score, dist) = resultValues(config.metric, col("raw"), config.score)
    perShard.toDF("qid", "id", "raw", "rank")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= lim)
      .select(col("qid"), col("id"),
        score.cast("double").as("score"), dist.cast("double").as("distance"),
        lit(config.metric.name).as("metric"))
  }
}
