package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.core.{Metric, Normalize, ScoreMode}
import graft.expr._

/** Column-level vector function library (the engine's `functions._`).
  *
  * Inputs are coerced to array<float> so semantics match the reference's
  * f32 storage (SURVEY §1.2); all math runs in Double inside codegen'd
  * Catalyst expressions.
  */
object VectorFunctions {

  private val floatArray = ArrayType(FloatType)

  private def asFloatArray(c: Column): Column =
    c.cast(floatArray)

  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    Bridge.column(e)

  private def expr0(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    Bridge.expression(c)

  /** Raw metric value (reference `compute`, distances.rs:42-68). */
  def vecDistance(metric: Metric, a: Column, b: Column): Column =
    col2(VectorDistance(expr0(asFloatArray(a)), expr0(asFloatArray(b)), metric.code))

  /** True normalized cosine (clamped, zero-vector -> 0); used for funnel
    * prefix scoring (distances.rs:160-177). */
  def trueCosine(a: Column, b: Column): Column =
    col2(VectorDistance(expr0(asFloatArray(a)), expr0(asFloatArray(b)),
      VectorKernels.TRUE_COSINE_CODE))

  /** Ascending rank value from a raw metric column (distances.rs:108-119). */
  def rankValue(metric: Metric, raw: Column): Column = metric match {
    case Metric.Cosine       => lit(1.0) - raw
    case Metric.InnerProduct => -raw
    case _                   => raw
  }

  /** Higher-is-better similarity from a raw metric column (distances.rs:122-128). */
  def similarityValue(metric: Metric, raw: Column): Column = metric match {
    case Metric.Cosine | Metric.InnerProduct => raw
    case Metric.NegativeInnerProduct         => -raw
    case _                                   => lit(1.0) / (lit(1.0) + raw)
  }

  /** (score, distance) per SURVEY §2.8 / vettore_distance.ex:525-547. */
  def resultValues(metric: Metric, raw: Column, mode: ScoreMode): (Column, Column) =
    metric match {
      case Metric.NegativeInnerProduct => (-raw, raw)
      case Metric.Cosine =>
        val score = mode match {
          case ScoreMode.Raw        => raw
          case ScoreMode.Similarity => (raw + lit(1.0)) / lit(2.0)
        }
        (score, lit(1.0) - raw)
      case Metric.InnerProduct => (raw, -raw)
      case _ =>
        val score = mode match {
          case ScoreMode.Raw        => -raw
          case ScoreMode.Similarity => lit(1.0) / (lit(1.0) + raw)
        }
        (score, raw)
    }

  /** Vector normalization column (modes per graft.core.Normalize). */
  def normalizeVector(mode: Normalize, v: Column): Column = {
    val code = mode match {
      case Normalize.None   => 0
      case Normalize.L2     => 1
      case Normalize.ZScore => 2
      case Normalize.MinMax => 3
    }
    col2(NormalizeVector(expr0(asFloatArray(v)), code))
  }

  /** Sign-bit packing into Long words (64 dims/word). */
  def packSignBits(v: Column): Column =
    col2(PackSignBits(expr0(asFloatArray(v))))

  /** Hamming over packed words, padding bits masked. */
  def packedHamming(a: Column, b: Column, dims: Int): Column =
    col2(PackedHamming(expr0(a), expr0(b), dims))

  /** Jaccard over packed words, padding bits masked. */
  def packedJaccard(a: Column, b: Column, dims: Int): Column =
    col2(PackedJaccard(expr0(a), expr0(b), dims))

  /** Asymmetric binary dot: packed sign words scored against the
    * full-precision query (see VectorKernels.packedAsymmetricDot). */
  def packedAsymmetricDot(a: Column, q: Column): Column =
    col2(PackedAsymmetricDot(expr0(a), expr0(asFloatArray(q))))

  /** ColBERT/MaxSim late-interaction score. */
  def maxSim(metric: Metric, queryVecs: Column, docVecs: Column): Column =
    col2(MaxSim(
      expr0(queryVecs.cast(ArrayType(floatArray))),
      expr0(docVecs.cast(ArrayType(floatArray))),
      metric.code))

  /** Pack a f32 vector into a BinaryType column (4 bytes/dim) — the
    * scan-friendly at-rest layout for brute-force search over parquet. */
  def packF32(v: Column): Column =
    col2(PackFloats(expr0(asFloatArray(v))))

  /** Inverse of [[packF32]]. */
  def unpackF32(b: Column): Column =
    col2(UnpackFloats(expr0(b)))

  /** Raw metric value between a packed byte vector column and a query
    * literal, reading floats in place. */
  def binaryVecDistance(metric: Metric, packed: Column, query: Array[Float]): Column =
    col2(BinaryVectorDistance(expr0(packed), expr0(vecLit(query)), metric.code))

  /** Pack a f32 vector into bf16 binary (2 bytes/dim, RNE rounding) —
    * HALF the at-rest/scan footprint of [[packF32]] for ~3 significant
    * decimal digits, with f32's full exponent range. */
  def packBf16(v: Column): Column =
    col2(PackBf16(expr0(asFloatArray(v))))

  /** Decoded f32 values of a [[packBf16]] vector (the rounded corpus). */
  def unpackBf16(b: Column): Column =
    col2(UnpackBf16(expr0(b)))

  /** Raw metric value between a packed bf16 vector column and a query
    * literal, decoding bf16 in place. */
  def bf16VecDistance(metric: Metric, packed: Column, query: Array[Float]): Column =
    col2(Bf16VectorDistance(expr0(packed), expr0(vecLit(query)), metric.code))

  /** [[bf16VecDistance]] by explicit kernel code — for ranks outside the
    * Metric enum (e.g. `VectorKernels.TRUE_COSINE_CODE`, the funnel's
    * prefix-stage scorer). */
  def bf16VecDistanceCode(code: Int, packed: Column, query: Array[Float]): Column =
    col2(Bf16VectorDistance(expr0(packed), expr0(vecLit(query)), code))

  /** ADC score of a quantized byte-code column against a per-query
    * partial-distance table (position-major, `table(pos*stride+code)`).
    * The table is a plan CONSTANT carried as a reference object — large
    * tables must not become array Literals (see AdcDistanceConst). */
  def adcDistance(codes: Column, table: Array[Double], stride: Int): Column =
    col2(graft.expr.AdcDistanceConst(expr0(codes), table, stride))

  /** ADC score against a table COLUMN (array<double>) — the batch-search
    * shape where each query's table rides the broadcast query side; only
    * the touched entries are read per row. */
  def adcDistanceDyn(codes: Column, table: Column, stride: Int): Column =
    col2(graft.expr.AdcDistance(expr0(codes), expr0(table), stride))

  /** A f32 vector literal. */
  def vecLit(v: Array[Float]): Column = typedlit(v)
}
