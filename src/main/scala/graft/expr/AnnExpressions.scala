package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused ANN ingest encodes, following the [[MinhashBandKeys]] pattern:
  * each encode is ONE opaque codegen node calling the SAME scalar kernel
  * as the driver-side path (so results — and gate hashes — are
  * byte-identical to the former Scala-UDF columns), but the hot ingest
  * projection stays inside whole-stage codegen and reads the input with
  * a single primitive `toFloatArray` copy instead of a boxed
  * `Seq[Float]` conversion per row. Trained parameters (model, codebooks,
  * centroids, config) ride the plan as reference objects — serialized
  * once per task, not once per row. */

/** Fused SQ8 affine encode — [[graft.ann.Sq8.encodeVec]] as a codegen
  * node. */
case class Sq8Encode(child: Expression, model: graft.ann.Sq8.Model)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.Sq8.encodeVecData(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("sq8Model", model)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.Sq8.encodeVecData($v, $m);")
  }

  override protected def withNewChildInternal(c: Expression): Sq8Encode =
    copy(child = c)
}

/** Fused PQ subspace encode — [[graft.ann.Pq.encodeVec]] as a codegen
  * node (per-subspace L2 argmin over the codebooks). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.Pq.encodeVecData(v.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.Pq.encodeVecData($v, $cb);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Fused IVF cell assignment — [[graft.ann.IvfIndex.nearestCentroid]] as
  * a codegen node. */
case class IvfCell(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.IvfIndex.cellData(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.IvfIndex.cellData($v, $cents);")
  }

  override protected def withNewChildInternal(c: Expression): IvfCell =
    copy(child = c)
}

/** Fused cosine-LSH band keys — [[graft.ann.CosineLsh.bandKeys]] as a
  * codegen node. */
case class LshBandKeys(child: Expression, config: graft.ann.CosineLsh.LshConfig)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.CosineLsh.bandKeysData(v.asInstanceOf[ArrayData], config)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cfg = ctx.addReferenceObj("lshConfig", config)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.CosineLsh.bandKeysData($v, $cfg);")
  }

  override protected def withNewChildInternal(c: Expression): LshBandKeys =
    copy(child = c)
}
