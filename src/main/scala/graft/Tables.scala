package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CollectionConfig, Metric}
import graft.prepare.Prepare

/** Loaders that adapt the driver's test tables into canonical collection
  * frames (schema per SURVEY §1.3).
  *
  * NOTE on single-file inputs: a one-row-group parquet file is ONE scan
  * split no matter the split config, so per-row-expensive work upstream
  * of the first exchange runs on one core. A measured opt-in spread
  * (round-robin repartition when splits < parallelism) was tried in r15
  * and REVERTED — on gate-scale data each added 32-task stage cost more
  * than it saved (contamination/minhash rows 1.5-5x worse). Callers with
  * genuinely large single-file corpora should pre-repartition at ingest;
  * any real multi-split corpus is unaffected. */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
