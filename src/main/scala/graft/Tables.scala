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
