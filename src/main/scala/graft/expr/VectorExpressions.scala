package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions for the vector kernels.
  *
  * Design: each expression stays inside whole-stage codegen by emitting a
  * single static call into [[VectorKernels]] (tight JIT-compiled loops over
  * ArrayData, no per-element boxing, no intermediate arrays). This is the
  * Spark-native analogue of the reference's batched SIMD NIF kernels
  * (native/vettore/src/distances.rs): the batching unit is the partition,
  * the kernel is JVM-JIT vectorized.
  *
  * Compared to composing `zip_with`/`aggregate` higher-order functions,
  * these expressions avoid materializing an intermediate array per row per
  * metric — the difference between O(dims) allocations and zero per row —
  * which matters when scanning 10^9+ rows.
  */

private object ExprHelpers {
  val floatArray: ArrayType = ArrayType(FloatType)
  val longArray: ArrayType = ArrayType(LongType)
}

/** Raw metric value between two f32 vectors. `metricCode` 0..8 per
  * graft.core.Metric plus 9 = true cosine (funnel prefixes). */
case class VectorDistance(left: Expression, right: Expression, metricCode: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.distance(metricCode, a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorKernels.distance($metricCode, $a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDistance =
    copy(left = l, right = r)
}

/** Pack sign bits of a f32 vector into Long words (64 dims per word). */
case class PackSignBits(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pack_sign_bits"

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.packSignBits(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.VectorKernels.packSignBits($v);")

  override protected def withNewChildInternal(c: Expression): PackSignBits = copy(child = c)
}

/** Hamming (popcount of XOR) over packed sign words, padding masked. */
case class PackedHamming(left: Expression, right: Expression, dims: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "packed_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.packedHamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorKernels.packedHamming($a, $b, $dims);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackedHamming =
    copy(left = l, right = r)
}

/** Jaccard over packed sign words, padding masked. */
case class PackedJaccard(left: Expression, right: Expression, dims: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "packed_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.packedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorKernels.packedJaccard($a, $b, $dims);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackedJaccard =
    copy(left = l, right = r)
}

/** Normalize a f32 vector; mode 0=none 1=l2 2=zscore 3=minmax. */
case class NormalizeVector(child: Expression, mode: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "normalize_vector"

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.normalize(mode, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.VectorKernels.normalize($mode, $v);")

  override protected def withNewChildInternal(c: Expression): NormalizeVector = copy(child = c)
}

/** ColBERT/MaxSim late-interaction score between two multi-vector sets. */
case class MaxSim(left: Expression, right: Expression, metricCode: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_sim"

  override protected def nullSafeEval(q: Any, d: Any): Any =
    VectorKernels.maxSim(metricCode, q.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d) =>
      s"${ev.value} = graft.expr.VectorKernels.maxSim($metricCode, $q, $d);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MaxSim =
    copy(left = l, right = r)
}
