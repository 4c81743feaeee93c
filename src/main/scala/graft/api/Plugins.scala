package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.core.CollectionConfig

/** Pluggable search-index behaviour — the Spark analog of the
  * reference's `Vettore.Index` behaviour (lib/vettore/index.ex:12-17):
  * a collection names its index, and any module implementing the
  * contract can serve it. Built-in families (flat/hnsw/lsh/ivf/sq8/pq/
  * ivfpq) stay on [[GraftDb]]'s internal dispatch (they share its
  * model/frame caches); an implementation registered in
  * [[GraftIndexRegistry]] extends that dispatch from outside the
  * `graft` package without touching engine code.
  *
  * The contract is frame-in/frame-out: `df` is the collection's
  * canonical frame (id, value, vector, vectors?, binary_vector,
  * metadata?), and results must use the facade's result schema —
  * `(id, score, distance, metric)` at minimum; built-ins return the
  * full `(id, value, score, distance, metric, metadata)` convention,
  * which is also the schema the default [[GraftIndex.searchMany]]
  * yields for an EMPTY batch — so callers can swap a custom index for
  * a built-in without changing a line. State (trained
  * models, encoded frames) is the implementation's concern; use
  * [[GraftIndex.onMutation]] to drop per-collection state when the
  * facade mutates the underlying frame.
  */
trait GraftIndex {

  /** Registry key: what a collection's `index` config names. */
  def name: String

  /** Serve one query. `filter` is an optional row predicate on the
    * collection frame; implementations choose pre- vs post-filter
    * semantics (built-ins post-filter ANN candidates). */
  def search(df: DataFrame, config: CollectionConfig, query: Array[Float],
      limit: Int, filter: Option[Column]): DataFrame

  /** Serve a bounded frame of `(qid, qvector)` queries. The default
    * loops [[search]] per collected query row and unions with a `qid`
    * column — correct for any implementation, but driver-bounded by
    * the query-frame contract; scale-conscious implementations
    * override with a genuine batch plan (one scan for all queries,
    * like every built-in family). */
  def searchMany(df: DataFrame, config: CollectionConfig, queries: DataFrame,
      limit: Int, knownNq: Long, filter: Option[Column]): DataFrame = {
    // numeric element conversion (not getSeq[Float]): callers may pass
    // array<double> qvectors, which the built-ins tolerate too
    val qs = queries.select(col("qid").cast("string"), col("qvector"))
      .collect().map(r => (r.getString(0),
        r.getSeq[Number](1).map(_.floatValue).toArray))
    if (qs.isEmpty) {
      // empty batch -> empty frame with the facade result-convention
      // schema (id, value, score, distance, metric, metadata, qid) —
      // the SAME columns the non-empty loop yields for a built-in-shaped
      // search(), so a consumer selecting 'value' or unionByName-ing
      // results does not fail only on empty batches (reduceLeft on zero
      // frames would throw). value/metadata types follow the collection
      // frame when it carries them.
      import org.apache.spark.sql.types._
      def fieldType(name: String, fallback: DataType): DataType =
        if (df.columns.contains(name)) df.schema(name).dataType else fallback
      df.sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("id", fieldType("id", StringType)),
          StructField("value", fieldType("value", StringType)),
          StructField("score", DoubleType), StructField("distance", DoubleType),
          StructField("metric", StringType),
          StructField("metadata", fieldType("metadata", NullType)),
          StructField("qid", StringType))))
    } else qs.map { case (qid, vec) =>
      search(df, config, vec, limit, filter).withColumn("qid", lit(qid))
    }.reduceLeft(_ unionByName _)
  }

  /** Invalidation hook: the facade calls this whenever collection
    * `collection`'s frame changes (insert/delete/load) or closes, so
    * implementations can drop cached models/frames for it. */
  def onMutation(collection: String): Unit = ()
}

/** Process-wide registry of third-party [[GraftIndex]] implementations
  * (reference: custom index modules resolve by behaviour check,
  * lib/vettore/collection.ex:1283-1298). Built-in family names are
  * reserved and cannot be overridden — a plugin shadowing `flat` would
  * silently change every default collection. */
object GraftIndexRegistry {
  val BuiltinNames: Set[String] =
    Set("flat", "bf16", "hnsw", "vamana", "lsh", "ivf", "sq8", "pq", "apq",
      "ivfpq", "ivfbf16", "rabitq", "ivfrabitq")

  private val impls =
    scala.collection.concurrent.TrieMap.empty[String, GraftIndex]

  def register(impl: GraftIndex): Unit = {
    require(impl.name.nonEmpty, "index name must be non-empty")
    require(!BuiltinNames(impl.name), s"index name ${impl.name} is reserved")
    impls.put(impl.name, impl)
  }

  def unregister(name: String): Unit = impls.remove(name)

  def lookup(name: String): Option[GraftIndex] = impls.get(name)

  def names: Seq[String] = impls.keys.toSeq.sorted

  private[api] def notifyMutation(collection: String): Unit =
    impls.values.foreach(_.onMutation(collection))
}

/** Pluggable collection persistence — the Spark analog of the
  * reference's `Vettore.Store` behaviour (lib/vettore/store.ex:15-29).
  * The live collection stays a DataFrame either way (Spark, not the
  * store, is the canonical in-session state — mirroring "ETS remains
  * the canonical source"); a store owns only the at-rest round trip.
  *
  * A store CANNOT bypass restored-record validation: whatever frame
  * [[load]] returns, [[GraftDb.loadSnapshot]] re-runs the full record
  * validation scan and derived-column rebuild before the collection
  * registers (the contract the reference's adversarial suite pins —
  * test/vector_adversarial_test.exs:294). */
trait GraftStore {

  /** Registry key. */
  def name: String

  /** Persist the collection frame + its config at `path`. */
  def snapshot(df: DataFrame, config: CollectionConfig, path: String): Unit

  /** Restore `(frame, config)` from `path`, applying whitelisted
    * overrides ([[graft.store.CollectionStore.OverridableKeys]]). The
    * returned frame is UNTRUSTED — the facade validates it. */
  def load(spark: SparkSession, path: String,
      overrides: Map[String, String]): (DataFrame, CollectionConfig)
}

/** Default store: Parquet + JSON config sidecar via
  * [[graft.store.CollectionStore]]. */
object ParquetStore extends GraftStore {
  def name: String = "parquet"
  def snapshot(df: DataFrame, config: CollectionConfig, path: String): Unit =
    graft.store.CollectionStore.snapshot(df, config, path)
  def load(spark: SparkSession, path: String,
      overrides: Map[String, String]): (DataFrame, CollectionConfig) =
    graft.store.CollectionStore.load(spark, path, overrides)
}

/** Process-wide registry of [[GraftStore]] implementations; `parquet`
  * is pre-registered and is the facade default. */
object GraftStoreRegistry {
  private val impls = {
    val m = scala.collection.concurrent.TrieMap.empty[String, GraftStore]
    m.put(ParquetStore.name, ParquetStore)
    m
  }

  def register(impl: GraftStore): Unit = {
    require(impl.name.nonEmpty, "store name must be non-empty")
    impls.put(impl.name, impl)
  }

  def unregister(name: String): Unit =
    if (name != ParquetStore.name) impls.remove(name)

  def apply(name: String): GraftStore = impls.getOrElse(name,
    throw new IllegalArgumentException(s"unknown store $name"))

  def names: Seq[String] = impls.keys.toSeq.sorted
}
