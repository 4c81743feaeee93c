package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded max-heap on (rank, id): keeps the k smallest (rank, id)
  * pairs with Spark SQL's exact ordering semantics — doubles compare
  * like `ORDER BY rank ASC` (`-0.0 == 0.0`, NaN sorts last:
  * `if (a == b) 0 else Double.compare(a, b)`), ties break by the id's
  * BINARY UTF-8 order (`UTF8String.compareTo`, Spark's string sort) —
  * so a heap cut is bit-identical to `ORDER BY (rank, id) LIMIT k`.
  * The distributed twin of [[graft.index.FlatIndex.BoundedRankHeap]]
  * (which holds Java Strings; this one stays in Spark's internal
  * representation). */
final class TopKHeap(val k: Int) extends Serializable {
  private val ranks = new Array[Double](math.max(k, 1))
  private val raws = new Array[Double](math.max(k, 1))
  private val ids = new Array[UTF8String](math.max(k, 1))
  private var n = 0

  private def cmpRank(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def worse(r1: Double, id1: UTF8String, r2: Double, id2: UTF8String): Boolean = {
    val c = cmpRank(r1, r2)
    c > 0 || (c == 0 && id1.compareTo(id2) > 0)
  }

  def size: Int = n

  def offer(rank: Double, raw: Double, id: UTF8String): Unit = {
    if (k == 0) return
    if (n < k) {
      ranks(n) = rank; raws(n) = raw; ids(n) = id
      n += 1
      siftUp(n - 1)
    } else if (worse(ranks(0), ids(0), rank, id)) {
      ranks(0) = rank; raws(0) = raw; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(ranks(i), ids(i), ranks(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var worst = i
      if (l < n && worse(ranks(l), ids(l), ranks(worst), ids(worst))) worst = l
      if (r < n && worse(ranks(r), ids(r), ranks(worst), ids(worst))) worst = r
      if (worst == i) return
      swap(i, worst); i = worst
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val tr = ranks(i); ranks(i) = ranks(j); ranks(j) = tr
    val tw = raws(i); raws(i) = raws(j); raws(j) = tw
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def foreachEntry(f: (Double, Double, UTF8String) => Unit): Unit = {
    var i = 0
    while (i < n) { f(ranks(i), raws(i), ids(i)); i += 1 }
  }

  /** (id, raw, rank) sorted by (rank asc, id asc). */
  def sorted: Array[(UTF8String, Double, Double)] = {
    val out = Array.tabulate(n)(i => (ids(i), raws(i), ranks(i)))
    scala.util.Sorting.stableSort(out,
      (a: (UTF8String, Double, Double), b: (UTF8String, Double, Double)) => {
        val c = cmpRank(a._3, b._3)
        c < 0 || (c == 0 && a._1.compareTo(b._1) < 0)
      })
    out
  }
}

/** Per-query bounded top-k over (id, distances[nq]) rows —
  * [[graft.index.FlatIndex.searchMany]]'s heap-scan batch algorithm as
  * a Catalyst `TypedImperativeAggregate`: each partition keeps nq
  * bounded heaps as its partial aggregation buffer (ObjectHashAggregate
  * map-side combine), the merge unions heap contents, and the final row
  * holds every query's top k. No (rows × queries) pair row is ever
  * materialized and nothing is sorted beyond the nq*k winners — the
  * shape that beats a window cut's per-partition sort of the exploded
  * triples by the sort's log factor and its full row traffic.
  *
  * Output: `array<struct<qi int, id string, raw double>>`, each query's
  * entries in (rank, id)-ascending order — bit-identical to
  * `ORDER BY rank, id LIMIT k` per query (the heap comparator
  * replicates Spark's double ordering and binary string ties; rank =
  * [[VectorKernels.rankValue]] of `raw`, the same scalar
  * `Search.rankCol` computes). Rows with a NULL id or NULL distance
  * array contribute nothing (a validated collection has neither). */
case class BatchTopKAgg(idExpr: Expression, distsExpr: Expression,
    nq: Int, k: Int, metricCode: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[TopKHeap]] {

  require(nq >= 0, "nq must be non-negative")
  require(k >= 0, "k must be non-negative")

  override def children: Seq[Expression] = Seq(idExpr, distsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qi", IntegerType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("raw", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "batch_topk"

  override def createAggregationBuffer(): Array[TopKHeap] =
    Array.fill(nq)(new TopKHeap(k))

  override def update(buf: Array[TopKHeap], input: InternalRow): Array[TopKHeap] = {
    val idv = idExpr.eval(input)
    val ds = distsExpr.eval(input)
    if (idv != null && ds != null) {
      // the input row's buffers are reused across rows — copy the id out
      val id = idv.asInstanceOf[UTF8String].clone()
      val arr = ds.asInstanceOf[ArrayData]
      var i = 0
      while (i < nq) {
        val raw = arr.getDouble(i)
        buf(i).offer(VectorKernels.rankValue(metricCode, raw), raw, id)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[TopKHeap], b2: Array[TopKHeap]): Array[TopKHeap] = {
    var i = 0
    while (i < nq) {
      b2(i).foreachEntry((r, w, id) => b1(i).offer(r, w, id))
      i += 1
    }
    b1
  }

  override def eval(buf: Array[TopKHeap]): Any = {
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](nq * math.max(k, 1))
    var qi = 0
    while (qi < nq) {
      buf(qi).sorted.foreach { case (id, raw, _) =>
        out += new GenericInternalRow(Array[Any](qi, id, raw))
      }
      qi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: Array[TopKHeap]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) {
      out.writeInt(buf(i).size)
      buf(i).foreachEntry { (r, w, id) =>
        out.writeDouble(r); out.writeDouble(w)
        val b = id.getBytes
        out.writeInt(b.length); out.write(b)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[TopKHeap] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = in.readInt()
    val buf = Array.fill(m)(new TopKHeap(k))
    var i = 0
    while (i < m) {
      val entries = in.readInt()
      var j = 0
      while (j < entries) {
        val r = in.readDouble(); val w = in.readDouble()
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf(i).offer(r, w, UTF8String.fromBytes(b))
        j += 1
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BatchTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BatchTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BatchTopKAgg =
    copy(idExpr = newChildren(0), distsExpr = newChildren(1))
}
