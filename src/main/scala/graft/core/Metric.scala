package graft.core

/** Distance / similarity metric taxonomy of the engine.
  *
  * Mirrors the reference's nine metrics and their compact codes
  * (reference: native/vettore/src/distances.rs:10-38,
  * lib/vettore/collection.ex:1306-1315) but is otherwise an independent
  * Spark-first design: every metric is evaluated by a Catalyst expression
  * (graft.expr.VectorDistance) in Double precision over f32 inputs, which
  * subsumes the reference's "f32 SIMD with f64 overflow recovery" scheme.
  *
  * Semantics notes (behavioral parity, not code parity):
  *  - `Cosine` as a *collection metric* scores raw dot products, because
  *    vectors are L2-normalized at ingest (distances.rs:49 uses dot for
  *    Cosine). The true normalized cosine (clamped to [-1,1], zero vector
  *    -> 0.0) is a separate kernel used for prefix scoring in funnel
  *    search (distances.rs:160-177, search.rs:56-59).
  *  - `Hamming`/`Jaccard` are over float *truthiness* (x != 0.0)
  *    (distances.rs:319-347).
  *  - rank value (ascending = better): cosine -> 1-raw, inner_product ->
  *    -raw, everything else raw (distances.rs:108-119).
  *  - similarity value (descending = better): cosine/IP -> raw, neg-IP ->
  *    -raw, distances -> 1/(1+raw) (distances.rs:122-128).
  */
sealed abstract class Metric(val code: Int, val name: String) extends Serializable {
  /** true for metrics where larger raw values mean "closer". */
  def isSimilarity: Boolean = this == Metric.Cosine || this == Metric.InnerProduct
}

object Metric {
  case object L2                   extends Metric(0, "l2")
  case object L2Squared            extends Metric(1, "l2_squared")
  case object Cosine               extends Metric(2, "cosine")
  case object InnerProduct         extends Metric(3, "inner_product")
  case object NegativeInnerProduct extends Metric(4, "negative_inner_product")
  case object Manhattan            extends Metric(5, "manhattan")
  case object Chebyshev            extends Metric(6, "chebyshev")
  case object Hamming              extends Metric(7, "hamming")
  case object Jaccard              extends Metric(8, "jaccard")

  val all: Seq[Metric] = Seq(L2, L2Squared, Cosine, InnerProduct,
    NegativeInnerProduct, Manhattan, Chebyshev, Hamming, Jaccard)

  private val byCode = all.map(m => m.code -> m).toMap

  def fromCode(code: Int): Metric =
    byCode.getOrElse(code, throw new IllegalArgumentException(s"unknown metric code $code"))

  /** Accepts canonical names plus the reference's aliases
    * (collection.ex:1300-1304: euclidean->l2, dot/dot_product->inner_product). */
  def fromName(name: String): Metric = name.toLowerCase match {
    case "l2" | "euclidean"          => L2
    case "l2_squared"                => L2Squared
    case "cosine"                    => Cosine
    case "inner_product" | "dot" | "dot_product" => InnerProduct
    case "negative_inner_product"    => NegativeInnerProduct
    case "manhattan"                 => Manhattan
    case "chebyshev"                 => Chebyshev
    case "hamming"                   => Hamming
    case "jaccard"                   => Jaccard
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** Raw metric value -> ascending rank value (smaller = better match). */
  def rankValue(metric: Metric, raw: Double): Double = metric match {
    case Cosine       => 1.0 - raw
    case InnerProduct => -raw
    case _            => raw
  }

  /** Raw metric value -> higher-is-better similarity (used by MaxSim & MMR). */
  def similarityValue(metric: Metric, raw: Double): Double = metric match {
    case Cosine | InnerProduct => raw
    case NegativeInnerProduct  => -raw
    case _                     => 1.0 / (1.0 + raw)
  }
}

/** Per-vector normalization applied at ingest and to query literals
  * (reference: distances.rs:350-410, lib/vettore_distance.ex:55-59). */
sealed abstract class Normalize(val name: String) extends Serializable
object Normalize {
  case object None   extends Normalize("none")
  case object L2     extends Normalize("l2")
  case object ZScore extends Normalize("zscore")
  case object MinMax extends Normalize("minmax")

  def fromName(name: String): Normalize = name.toLowerCase match {
    case "none"   => None
    case "l2"     => L2
    case "zscore" => ZScore
    case "minmax" => MinMax
    case other    => throw new IllegalArgumentException(s"unknown normalize $other")
  }

  /** Default pairing: cosine collections L2-normalize, everything else
    * stores vectors verbatim (collection.ex:1317-1319). */
  def defaultFor(metric: Metric): Normalize =
    if (metric == Metric.Cosine) L2 else None
}

/** How raw metric values are presented as (score, distance) result columns
  * (reference: lib/vettore_distance.ex:525-547; see SURVEY §2.8). */
sealed abstract class ScoreMode(val name: String) extends Serializable
object ScoreMode {
  /** score = raw similarity / negated distance. Collection-API default. */
  case object Raw extends ScoreMode("raw")
  /** score mapped into a higher-is-better similarity. Compat-API default. */
  case object Similarity extends ScoreMode("similarity")

  def fromName(name: String): ScoreMode = name.toLowerCase match {
    case "raw"        => Raw
    case "similarity" => Similarity
    case other        => throw new IllegalArgumentException(s"unknown score mode $other")
  }

  /** (score, distance) for one raw value. `distance` is None only for
    * operators that have no distance notion (MaxSim sums). Matches
    * do_result_values (vettore_distance.ex:525-547) including the
    * negative_inner_product special case. */
  def resultValues(metric: Metric, raw: Double, mode: ScoreMode): (Double, Option[Double]) =
    metric match {
      case Metric.NegativeInnerProduct => (-raw, Some(raw))
      case Metric.Cosine =>
        val score = mode match { case Raw => raw; case Similarity => (raw + 1.0) / 2.0 }
        (score, Some(1.0 - raw))
      case Metric.InnerProduct =>
        (raw, Some(-raw)) // same score in both modes
      case _ =>
        val score = mode match { case Raw => -raw; case Similarity => 1.0 / (1.0 + raw) }
        (score, Some(raw))
    }
}

/** Collection configuration (reference: Vettore.Collection options,
  * lib/vettore/collection.ex:10-47). Index selection collapses to the
  * *search strategy* in Spark: `flat` is a scan + TakeOrderedAndProject,
  * `lsh` is the distributed ANN path (candidates + exact rerank) standing
  * in for the reference's single-node HNSW graph. */
final case class CollectionConfig(
    name: String,
    dimensions: Int,
    metric: Metric = Metric.Cosine,
    normalize: Option[Normalize] = None, // None -> Normalize.defaultFor(metric)
    score: ScoreMode = ScoreMode.Raw,
    index: String = "flat",
    compressed: Boolean = false) {
  require(name.nonEmpty, "collection name must be non-empty")
  require(dimensions > 0, "dimensions must be positive")
  def effectiveNormalize: Normalize = normalize.getOrElse(Normalize.defaultFor(metric))
}
