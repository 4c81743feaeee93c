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

/** Fused RaBitQ encode — [[graft.ann.RaBitQ.encodeVec]] as a codegen
  * node: rotated-residual sign bits + the two calibration factors +
  * the centroid dot, emitted as ONE struct so the rotation runs once
  * per row. */
case class RaBitQEncode(child: Expression, model: graft.ann.RaBitQ.Model)
    extends UnaryExpression {

  override def dataType: DataType = graft.ann.RaBitQ.schema
  override def prettyName: String = "rabitq_encode"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.RaBitQ.encodeRowData(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("rabitqModel", model)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.RaBitQ.encodeRowData($v, $m);")
  }

  override protected def withNewChildInternal(c: Expression): RaBitQEncode =
    copy(child = c)
}

/** Fused RaBitQ query rotation — [[graft.ann.RaBitQ.prepareQueryRot]]
  * as a codegen node (the batch path rotates nq query rows in plan). */
case class RaBitQQueryPrep(child: Expression, model: graft.ann.RaBitQ.Model)
    extends UnaryExpression {

  override def dataType: DataType = graft.ann.RaBitQ.qprepSchema
  override def prettyName: String = "rabitq_query_prep"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.RaBitQ.queryPrepRowData(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("rabitqModel", model)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.RaBitQ.queryPrepRowData($v, $m);")
  }

  override protected def withNewChildInternal(c: Expression): RaBitQQueryPrep =
    copy(child = c)
}

/** RaBitQ estimated-distance candidate rank against ONE driver-prepared
  * query ([[graft.ann.RaBitQ.rankBits]]); the prep rides the plan as a
  * reference object. */
case class RaBitQRank(child: Expression, qp: graft.ann.RaBitQ.QueryPrep,
    cc: Double, mode: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "rabitq_rank"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.RaBitQ.rankRowData(
      v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow], qp, cc, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("rabitqQuery", qp)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.RaBitQ.rankRowData($v, $q, $cc, $mode);")
  }

  override protected def withNewChildInternal(c: Expression): RaBitQRank =
    copy(child = c)
}

/** RaBitQ estimated-distance rank of a stored struct x an in-plan query
  * prep pair — the batch candidate scorer. */
case class RaBitQPairRank(left: Expression, right: Expression,
    cc: Double, mode: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "rabitq_pair_rank"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.ann.RaBitQ.pairRankRowData(
      a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
      b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow], cc, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ann.RaBitQ.pairRankRowData($a, $b, $cc, $mode);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RaBitQPairRank =
    copy(left = l, right = r)
}

/** Fused IVF x RaBitQ ingest encode — nearest cell + residual RaBitQ
  * codes + shifted oc' in ONE struct per row
  * ([[graft.ann.IvfRaBitQ.encodeRowData]]), so cell assignment and the
  * rotation run in one codegen pass over the ingest scan. */
case class IvfRaBitQEncode(child: Expression, model: graft.ann.IvfRaBitQ.Model)
    extends UnaryExpression {

  override def dataType: DataType = graft.ann.IvfRaBitQ.encSchema
  override def prettyName: String = "ivf_rabitq_encode"

  override protected def nullSafeEval(v: Any): Any =
    graft.ann.IvfRaBitQ.encodeRowData(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfRabitqModel", model)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ann.IvfRaBitQ.encodeRowData($v, $m);")
  }

  override protected def withNewChildInternal(c: Expression): IvfRaBitQEncode =
    copy(child = c)
}

/** Per-(query, probed cell) IVF x RaBitQ query prep — the batch path's
  * in-plan rotation of each query against each of ITS cells' centroids
  * ([[graft.ann.IvfRaBitQ.queryPrepRowData]]); nq x nprobe rows, the
  * corpus never enters. */
case class IvfRaBitQQueryPrep(left: Expression, right: Expression,
    model: graft.ann.IvfRaBitQ.Model) extends BinaryExpression {

  override def dataType: DataType = graft.ann.RaBitQ.qprepSchema
  override def prettyName: String = "ivf_rabitq_query_prep"

  override protected def nullSafeEval(v: Any, cell: Any): Any =
    graft.ann.IvfRaBitQ.queryPrepRowData(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfRabitqModel", model)
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.ann.IvfRaBitQ.queryPrepRowData($v, $cell, $m);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): IvfRaBitQQueryPrep = copy(left = l, right = r)
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
