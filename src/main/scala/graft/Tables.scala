package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.prepare.Prepare

/** Loaders that adapt the driver's test tables into canonical collection
  * frames (schema per SURVEY §1.3). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread an UNSPLITTABLE scan across the session's cores. A
    * one-row-group parquet file is ONE input split no matter how
    * `spark.sql.files.*` is tuned, so every per-row expression upstream
    * of the first exchange runs on a single core while the other N-1
    * idle — the guide's "one huge unsplittable file" input-skew case,
    * whose fix is a repartition immediately after the read.
    * Scale-adaptive by construction: when the scan already has at least
    * min(parallelism, 16) splits (any real multi-file/multi-row-group
    * corpus, and certainly the 100 TB shape), this is the IDENTITY — no
    * exchange is added. Round-robin repartition preserves results for
    * every gated operator (all are partition-independent; the oracle
    * hashes pin that).
    *
    * Use ONLY in front of genuinely heavy per-row work (md5 MinHash
    * signatures: ~8 digests x ~hundreds of shingles per document). On
    * tiny inputs every added exchange costs a scheduler round (~0.1-0.3 s
    * per 32-task stage locally) that cheap projections never earn back —
    * a blanket spread of every gate read measured SLOWER overall, so
    * callers opt in per operator. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.min(target, 16)) df
    else df.repartition(target)
  }

  /** The `embeddings` table as a raw (id, value, vector) frame. */
  def embeddingsRaw(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings").select(
      col("vec_id").cast("string").as("id"),
      col("vec_id").cast("string").as("value"),
      col("embedding").as("vector"),
      map(lit("label"), col("label").cast("string")).as("metadata"))

  /** Canonical prepared collection over the embeddings table. */
  def embeddingsCollection(spark: SparkSession, dir: String,
      config: CollectionConfig): DataFrame =
    Prepare.prepareEmbeddings(embeddingsRaw(spark, dir), config)

  /** One stored embedding vector, fetched to the driver as a query
    * literal (queries are driver-side values in the reference API too). */
  def queryVector(spark: SparkSession, dir: String, vecId: Long): Array[Float] =
    read(spark, dir, "embeddings").filter(col("vec_id") === vecId)
      .select("embedding").head().getSeq[Float](0).toArray

  def dims(spark: SparkSession, dir: String): Int =
    read(spark, dir, "embeddings").select(size(col("embedding"))).head().getInt(0)

  def cosineConfig(dims: Int): CollectionConfig =
    CollectionConfig("embeddings", dims, Metric.Cosine)

  def l2Config(dims: Int): CollectionConfig =
    CollectionConfig("embeddings", dims, Metric.L2)

  def ipConfig(dims: Int): CollectionConfig =
    CollectionConfig("embeddings", dims, Metric.InnerProduct)
}
