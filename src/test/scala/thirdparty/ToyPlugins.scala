package thirdparty

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.api.{GraftIndex, GraftStore}
import graft.core.CollectionConfig

/** Third-party plugin implementations living OUTSIDE the graft package —
  * they only touch the public plugin traits + core config types, proving
  * the extension contract works for an external user (the reference's
  * custom store/index modules, test/vector_adversarial_test.exs:1-106). */
object ToyBruteIndex extends GraftIndex {
  def name: String = "toybrute"

  // driver-side exact search: a deliberately naive but CORRECT
  // implementation — the contract test checks the facade serves it
  // verbatim, not that it scales
  def search(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, filter: Option[Column]): DataFrame = {
    val base = filter.foldLeft(df)(_.filter(_))
    val rows = base.select("id", "vector").collect().map { r =>
      val v = r.getSeq[Float](1)
      val d = math.sqrt(v.zip(query).map { case (a, b) =>
        (a - b).toDouble * (a - b) }.sum)
      (r.getString(0), d)
    }.sortBy { case (id, d) => (d, id) }.take(limit)
    val out = rows.map { case (id, d) => Row(id, -d, d, config.metric.name) }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("id", StringType),
        StructField("score", DoubleType),
        StructField("distance", DoubleType),
        StructField("metric", StringType))))
  }
}

/** Scripted index: ignores the corpus and query, returns a fixed frame —
  * the dispatch-proof analog of the reference's ScriptedIndex. */
class ScriptedIndex(indexName: String, results: () => DataFrame) extends GraftIndex {
  val mutated = scala.collection.mutable.ArrayBuffer.empty[String]
  def name: String = indexName
  def search(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, filter: Option[Column]): DataFrame = results()
  override def onMutation(collection: String): Unit =
    mutated.synchronized { mutated += collection }
}

/** In-memory store: snapshots live in a process map keyed by path. */
object ToyMemStore extends GraftStore {
  def name: String = "toymem"
  private val held = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[Row], StructType, CollectionConfig)]

  def snapshot(df: DataFrame, config: CollectionConfig, path: String): Unit =
    held.put(path, (df.collect().toSeq, df.schema, config))

  def load(spark: SparkSession, path: String,
      overrides: Map[String, String]): (DataFrame, CollectionConfig) = {
    val (rows, schema, config) = held.getOrElse(path,
      throw new IllegalArgumentException(s"no snapshot at $path"))
    val named = overrides.get("name").map(n => config.copy(name = n)).getOrElse(config)
    (spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema), named)
  }
}

/** Adversarial store: load hands back a malformed record (wrong
  * dimensionality) — the facade must reject it, proving a custom store
  * cannot bypass restored-record validation. */
object EvilStore extends GraftStore {
  def name: String = "evil"
  def snapshot(df: DataFrame, config: CollectionConfig, path: String): Unit = ()
  def load(spark: SparkSession, path: String,
      overrides: Map[String, String]): (DataFrame, CollectionConfig) = {
    val config = CollectionConfig("evil_out", 4, graft.core.Metric.L2)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("value", StringType),
      StructField("vector", ArrayType(FloatType))))
    val rows = java.util.Arrays.asList(
      Row("ok", "ok", Seq(1f, 2f, 3f, 4f)),
      Row("short", "short", Seq(1f, 2f))) // 2 dims in a 4-dim collection
    (spark.createDataFrame(rows, schema), config)
  }
}
