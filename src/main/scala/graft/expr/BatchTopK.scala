package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Id-type plumbing for the heap-cut batch aggregate: which catalyst id
  * types the heap can order/serialize, and their Spark-sort-identical
  * comparators. Restricted to the ATOMIC types whose internal values are
  * immutable primitives or UTF8String — enough for any realistic id
  * column (string, long web-scale doc ids, ints, timestamps, ...);
  * nested ids fall back to the window-cut plan. */
object BatchTopK {
  def supportsIdType(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | TimestampType |
         TimestampNTZType | DateType => true
    case _ => false
  }

  /** `ORDER BY id ASC`-identical comparator over internal values.
    * Doubles/floats use Spark's total order (`-0.0 == 0.0`, NaN last) —
    * the same semantics [[TopKHeap]] applies to ranks. */
  def idComparator(dt: DataType): (AnyRef, AnyRef) => Int = dt match {
    case StringType =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case LongType | TimestampType | TimestampNTZType =>
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[java.lang.Long], b.asInstanceOf[java.lang.Long])
    case IntegerType | DateType =>
      (a, b) => java.lang.Integer.compare(
        a.asInstanceOf[java.lang.Integer], b.asInstanceOf[java.lang.Integer])
    case ShortType =>
      (a, b) => java.lang.Short.compare(
        a.asInstanceOf[java.lang.Short], b.asInstanceOf[java.lang.Short])
    case ByteType =>
      (a, b) => java.lang.Byte.compare(
        a.asInstanceOf[java.lang.Byte], b.asInstanceOf[java.lang.Byte])
    case DoubleType =>
      (a, b) => {
        val x = a.asInstanceOf[java.lang.Double].doubleValue()
        val y = b.asInstanceOf[java.lang.Double].doubleValue()
        if (x == y) 0 else java.lang.Double.compare(x, y)
      }
    case FloatType =>
      (a, b) => {
        val x = a.asInstanceOf[java.lang.Float].floatValue()
        val y = b.asInstanceOf[java.lang.Float].floatValue()
        if (x == y) 0 else java.lang.Float.compare(x, y)
      }
    case BooleanType =>
      (a, b) => java.lang.Boolean.compare(
        a.asInstanceOf[java.lang.Boolean], b.asInstanceOf[java.lang.Boolean])
    case other =>
      throw new IllegalArgumentException(s"unsupported heap id type $other")
  }

  private[expr] def writeId(out: DataOutputStream, dt: DataType, id: AnyRef): Unit =
    dt match {
      case StringType =>
        val b = id.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      case LongType | TimestampType | TimestampNTZType =>
        out.writeLong(id.asInstanceOf[java.lang.Long])
      case IntegerType | DateType => out.writeInt(id.asInstanceOf[java.lang.Integer])
      case ShortType => out.writeShort(id.asInstanceOf[java.lang.Short].intValue())
      case ByteType => out.writeByte(id.asInstanceOf[java.lang.Byte].intValue())
      case DoubleType => out.writeDouble(id.asInstanceOf[java.lang.Double])
      case FloatType => out.writeFloat(id.asInstanceOf[java.lang.Float])
      case BooleanType => out.writeBoolean(id.asInstanceOf[java.lang.Boolean])
      case other =>
        throw new IllegalArgumentException(s"unsupported heap id type $other")
    }

  private[expr] def readId(in: DataInputStream, dt: DataType): AnyRef = dt match {
    case StringType =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      UTF8String.fromBytes(b)
    case LongType | TimestampType | TimestampNTZType => java.lang.Long.valueOf(in.readLong())
    case IntegerType | DateType => java.lang.Integer.valueOf(in.readInt())
    case ShortType => java.lang.Short.valueOf(in.readShort())
    case ByteType => java.lang.Byte.valueOf(in.readByte())
    case DoubleType => java.lang.Double.valueOf(in.readDouble())
    case FloatType => java.lang.Float.valueOf(in.readFloat())
    case BooleanType => java.lang.Boolean.valueOf(in.readBoolean())
    case other =>
      throw new IllegalArgumentException(s"unsupported heap id type $other")
  }
}

/** Bounded max-heap on (rank, id): keeps the k smallest (rank, id)
  * pairs with Spark SQL's exact ordering semantics — doubles compare
  * like `ORDER BY rank ASC` (`-0.0 == 0.0`, NaN sorts last:
  * `if (a == b) 0 else Double.compare(a, b)`), ties break by the id
  * comparator (for strings the BINARY UTF-8 order of
  * `UTF8String.compareTo`, Spark's string sort) — so a heap cut is
  * bit-identical to `ORDER BY (rank, id) LIMIT k` for ANY supported id
  * type. The distributed twin of
  * [[graft.index.FlatIndex.BoundedRankHeap]] (which holds Java Strings;
  * this one stays in Spark's internal representation). */
final class TopKHeap(val k: Int, val idCmp: (AnyRef, AnyRef) => Int)
    extends Serializable {
  /** String-id heap (the canonical collection schema). */
  def this(k: Int) = this(k, BatchTopK.idComparator(StringType))

  // arrays grow geometrically up to k: a heap that never sees k entries
  // (small partitions, grouped two-level merges) must not pay k slots
  // up front — a grouped aggregate holds one buffer PER (partition,
  // group) and eager nq*k slots per buffer multiply into GBs
  private var cap = math.min(math.max(k, 1), 16)
  private var ranks = new Array[Double](cap)
  private var raws = new Array[Double](cap)
  private var ids = new Array[AnyRef](cap)
  private var n = 0

  private def grow(): Unit = {
    cap = math.min(math.max(k, 1), cap * 2)
    ranks = java.util.Arrays.copyOf(ranks, cap)
    raws = java.util.Arrays.copyOf(raws, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  private def cmpRank(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def worse(r1: Double, id1: AnyRef, r2: Double, id2: AnyRef): Boolean = {
    val c = cmpRank(r1, r2)
    c > 0 || (c == 0 && idCmp(id1, id2) > 0)
  }

  def size: Int = n

  def offer(rank: Double, raw: Double, id: AnyRef): Unit = {
    if (k == 0) return
    if (n < k) {
      if (n == cap) grow()
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

  def foreachEntry(f: (Double, Double, AnyRef) => Unit): Unit = {
    var i = 0
    while (i < n) { f(ranks(i), raws(i), ids(i)); i += 1 }
  }

  /** (id, raw, rank) sorted by (rank asc, id asc). */
  def sorted: Array[(AnyRef, Double, Double)] = {
    val out = Array.tabulate(n)(i => (ids(i), raws(i), ranks(i)))
    scala.util.Sorting.stableSort(out,
      (a: (AnyRef, Double, Double), b: (AnyRef, Double, Double)) => {
        val c = cmpRank(a._3, b._3)
        c < 0 || (c == 0 && idCmp(a._1, b._1) < 0)
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
  * Output: `array<struct<qi int, id <idType>, raw double>>`, each
  * query's entries in (rank, id)-ascending order — bit-identical to
  * `ORDER BY rank, id LIMIT k` per query (the heap comparator
  * replicates Spark's double ordering and per-type id ties; rank =
  * [[VectorKernels.rankValue]] of `raw`, the same scalar
  * `Search.rankCol` computes). Any [[BatchTopK.supportsIdType]] id
  * column works — long web-scale doc ids take the same one-scan plan
  * as the canonical string schema. Rows with a NULL id or NULL
  * distance array contribute nothing (a validated collection has
  * neither). */
case class BatchTopKAgg(idExpr: Expression, distsExpr: Expression,
    nq: Int, k: Int, metricCode: Int, idType: DataType = StringType,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[TopKHeap]] {

  require(nq >= 0, "nq must be non-negative")
  require(k >= 0, "k must be non-negative")
  require(BatchTopK.supportsIdType(idType), s"unsupported heap id type $idType")

  @transient private lazy val idCmp = BatchTopK.idComparator(idType)

  override def children: Seq[Expression] = Seq(idExpr, distsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qi", IntegerType, nullable = false),
    StructField("id", idType, nullable = false),
    StructField("raw", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "batch_topk"

  override def createAggregationBuffer(): Array[TopKHeap] =
    Array.fill(nq)(new TopKHeap(k, idCmp))

  override def update(buf: Array[TopKHeap], input: InternalRow): Array[TopKHeap] = {
    val idv = idExpr.eval(input)
    val ds = distsExpr.eval(input)
    if (idv != null && ds != null) {
      // the input row's buffers are reused across rows — copy a string
      // id out; boxed primitives are immutable and need no copy
      val id: AnyRef = idv match {
        case u: UTF8String => u.clone()
        case x => x.asInstanceOf[AnyRef]
      }
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
        BatchTopK.writeId(out, idType, id)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[TopKHeap] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = in.readInt()
    val buf = Array.fill(m)(new TopKHeap(k, idCmp))
    var i = 0
    while (i < m) {
      val entries = in.readInt()
      var j = 0
      while (j < entries) {
        val r = in.readDouble(); val w = in.readDouble()
        buf(i).offer(r, w, BatchTopK.readId(in, idType))
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
